from . import attention, masks
