"""FlatBattle: fixed-map, flat-observation combat env — the stand-in for the
reference's standard SMAC env (``src/envs/starcraft2/starcraft2.py``).

Implements the flat scheme contract:
  * per-agent observation vectors (``get_obs_agent``, ``starcraft2.py:968+``):
    move feats ++ enemy feats ++ ally feats ++ own feats;
  * global state (``get_state:1144-1240``): ally/enemy unit rows + last-action
    block;
  * action space ``6 + n_enemies`` with slot-indexed attack (Medivacs heal
    ally slots through the same ids, the SMAC MMM convention);
  * ``get_obs_st_masks`` (``starcraft2.py:854-965``): per-entity masks over
    the flat obs/state vectors that let the flat QMixer do REFIL's imagined
    factorization (consumed at ``run.py:168-170`` -> ``qmix.py:43-63``).

The combat dynamics are EntityBattle's (``env.py``); this class translates the
flat action space and builds flat features from the same CombatState. The SMAC
map registry (``maps/smac_maps.py``) becomes ``MAP_REGISTRY`` below — fixed
army compositions for the classic maps whose unit types exist in the stand-in
roster.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..base import register_env
from . import units as U
from .env import CombatState, EntityBattle
from .scenarios import fixed_armies

# Classic SMAC map compositions (map name -> ally army, enemy army, episode
# limit); parity surface of maps/smac_maps.py restricted to the stand-in's
# unit roster.
MAP_REGISTRY: Dict[str, Tuple[list, list, int]] = {
    "3m": ([(3, "Marine")], [(3, "Marine")], 60),
    "8m": ([(8, "Marine")], [(8, "Marine")], 120),
    "25m": ([(25, "Marine")], [(25, "Marine")], 150),
    "5m_vs_6m": ([(5, "Marine")], [(6, "Marine")], 70),
    "8m_vs_9m": ([(8, "Marine")], [(9, "Marine")], 120),
    "10m_vs_11m": ([(10, "Marine")], [(11, "Marine")], 150),
    "27m_vs_30m": ([(27, "Marine")], [(30, "Marine")], 180),
    "MMM": (
        [(1, "Medivac"), (2, "Marauder"), (7, "Marine")],
        [(1, "Medivac"), (2, "Marauder"), (7, "Marine")],
        150,
    ),
    "MMM2": (
        [(1, "Medivac"), (2, "Marauder"), (7, "Marine")],
        [(1, "Medivac"), (3, "Marauder"), (8, "Marine")],
        180,
    ),
    "2s3z": ([(2, "Stalker"), (3, "Zealot")], [(2, "Stalker"), (3, "Zealot")], 120),
    "3s5z": ([(3, "Stalker"), (5, "Zealot")], [(3, "Stalker"), (5, "Zealot")], 150),
    "3s5z_vs_3s6z": (
        [(3, "Stalker"), (5, "Zealot")],
        [(3, "Stalker"), (6, "Zealot")],
        170,
    ),
    "1c3s5z": (
        [(1, "Colossus"), (3, "Stalker"), (5, "Zealot")],
        [(1, "Colossus"), (3, "Stalker"), (5, "Zealot")],
        180,
    ),
    "2m_vs_1z": ([(2, "Marine")], [(1, "Zealot")], 150),
    "2s_vs_1sc": ([(2, "Stalker")], [(1, "SpineCrawler")], 300),
    "3s_vs_3z": ([(3, "Stalker")], [(3, "Zealot")], 150),
    "3s_vs_4z": ([(3, "Stalker")], [(4, "Zealot")], 200),
    "3s_vs_5z": ([(3, "Stalker")], [(5, "Zealot")], 250),
    "6h_vs_8z": ([(6, "Hydralisk")], [(8, "Zealot")], 150),
    "2c_vs_64zg": ([(2, "Colossus")], [(64, "Zergling")], 400),
    "bane_vs_bane": (
        [(4, "Baneling"), (20, "Zergling")],
        [(4, "Baneling"), (20, "Zergling")],
        200,
    ),
    "so_many_baneling": ([(7, "Zealot")], [(32, "Baneling")], 100),
    "corridor": ([(6, "Zealot")], [(24, "Zergling")], 400),
}


def map_geometry(map_name: str, map_size: float):
    """Static walkability + terrain-height grids for maps whose identity IS
    their geometry (reference maps ship as binary .SC2Map files; SMAC reads
    ``pathing_grid``/``terrain_height`` out of them, ``starcraft2.py:330-342``).
    Grid cell = 1 map unit, indexed ``[x, y]``. Heights are in [0, 1].

    Maps not listed are open flat fields (their identity is army composition).
    Army anchors sit at center ± separation/2 along the x axis (theta=pi in
    ``EntityBattle.reset``), so geometry keeps those regions walkable.
    """
    M = int(np.ceil(map_size))
    walk = np.ones((M, M), bool)
    height = np.full((M, M), 0.5, np.float32)
    c = M // 2
    if map_name == "corridor":
        # two open chambers joined by a narrow choke: the map's whole point
        # is that 6 zealots hold the corridor against 24 zerglings
        walk[:] = False
        walk[: c - 4, :] = True          # left chamber (ally spawn)
        walk[c + 4 :, :] = True          # right chamber (enemy spawn)
        walk[c - 4 : c + 4, c - 2 : c + 2] = True  # the corridor
    elif map_name == "2c_vs_64zg":
        # high ground (right, ally colossi) vs low ground (left) split by a
        # cliff band only Colossi can cross; ground units detour via ramps
        # at the top and bottom edges
        height[: c - 1, :] = 0.25
        height[c + 1 :, :] = 0.75
        height[c - 1 : c + 1, :] = 0.5
        walk[c - 1 : c + 1, 4 : M - 4] = False  # cliff band, ramps at edges
        # NOTE: allies spawn on the LEFT anchor; swap sides is irrelevant to
        # dynamics since Colossi cliff-walk either way
    elif map_name == "so_many_baneling":
        # unwalkable rocks behind the ally spawn: zealots cannot retreat
        # west forever and must meet the banelings spread out
        walk[c - 13 : c - 11, : c] = False
    return walk, height


class FlatState(NamedTuple):
    core: CombatState
    last_action: jnp.ndarray  # (B, Na, A) onehot of each agent's last action


@register_env("flat_battle")
class FlatBattle:
    def __init__(
        self,
        map_name: str = "3m",
        entity_scheme: bool = False,
        episode_limit: Optional[int] = None,
        obs_all_health: bool = True,
        obs_own_health: bool = True,
        obs_last_action: bool = False,
        obs_instead_of_state: bool = False,
        state_last_action: bool = True,
        state_timestep_number: bool = False,
        obs_timestep_number: bool = False,
        obs_pathing_grid: bool = False,
        obs_terrain_height: bool = False,
        sight_range: float = 9.0,
        **combat_kwargs,
    ):
        assert not entity_scheme, "FlatBattle is the flat-scheme env"
        if map_name not in MAP_REGISTRY:
            raise ValueError(
                f"Unknown map {map_name!r}; available: {sorted(MAP_REGISTRY)}"
            )
        ally, enemy, default_limit = MAP_REGISTRY[map_name]
        self.map_name = map_name
        scen = fixed_armies(
            ally, enemy, rotate=False, separation=14, jitter=1,
            episode_limit=episode_limit or default_limit,
        )
        combat_kwargs.pop("scenario_dict", None)
        walk, height = map_geometry(
            map_name, combat_kwargs.get("map_size", 32.0)
        )
        self.core = EntityBattle(
            scenario_dict=scen,
            entity_scheme=True,
            random_tags=False,
            sight_range=sight_range,
            pathing_grid=walk,
            terrain_height=height,
            **combat_kwargs,
        )
        self.n_agents = self.core.max_na
        self.n_enemies = self.core.max_ne
        self.n_actions = 6 + self.n_enemies
        self.episode_limit = self.core.episode_limit
        self.obs_all_health = obs_all_health
        self.obs_own_health = obs_own_health or obs_all_health
        self.obs_last_action = obs_last_action
        # replace the global state with the concatenated agent observations
        # (reference starcraft2.py:1148-1153, size :1276-1279)
        self.obs_instead_of_state = obs_instead_of_state
        self.state_last_action = state_last_action
        self.state_timestep_number = state_timestep_number
        self.obs_timestep_number = obs_timestep_number
        # surrounding pathing/height blocks (reference starcraft2.py:836-850,
        # n_obs_pathing=8 / n_obs_height=9 at :218-219), sampled from the
        # per-map geometry grids at the reference's 8/9 surrounding points
        self.obs_pathing_grid = obs_pathing_grid
        self.obs_terrain_height = obs_terrain_height
        self.n_obs_pathing = 8
        self.n_obs_height = 9
        ma = self.core.move_amount
        # point offsets from get_surrounding_points (starcraft2.py:985-1006)
        self._surround = jnp.asarray(
            [
                (0, 2 * ma), (0, -2 * ma), (2 * ma, 0), (-2 * ma, 0),
                (ma, ma), (-ma, -ma), (ma, -ma), (-ma, ma), (0, 0),
            ],
            jnp.float32,
        )

        self.unit_type_bits = self.core.unit_type_bits
        self.shield_bits_ally = self.core.shield_bits
        self.shield_bits_enemy = self.core.shield_bits
        # off-diagonal gather index: row i lists agent ids != i in order
        idx = np.zeros((self.n_agents, max(self.n_agents - 1, 1)), np.int32)
        for i in range(self.n_agents):
            idx[i, : self.n_agents - 1] = [j for j in range(self.n_agents) if j != i]
        self._offdiag = jnp.asarray(idx)

    final_info_keys = ("battle_won", "episode_limit")

    # --- sizes (reference get_obs_size:1244-1271 / get_state_size:1274-1289) ---
    @property
    def nf_al_obs(self):
        nf = 4 + self.unit_type_bits
        if self.obs_all_health:
            nf += 1 + self.shield_bits_ally
        if self.obs_last_action:
            nf += self.n_actions
        return nf

    @property
    def nf_en_obs(self):
        nf = 4 + self.unit_type_bits
        if self.obs_all_health:
            nf += 1 + self.shield_bits_enemy
        return nf

    @property
    def nf_own(self):
        nf = self.unit_type_bits
        if self.obs_own_health:
            nf += 1 + self.shield_bits_ally
        if self.obs_timestep_number:
            nf += 1
        return nf

    @property
    def move_feats_len(self) -> int:
        """Move block length incl. pathing/height (reference :874-878)."""
        n = 4
        if self.obs_pathing_grid:
            n += self.n_obs_pathing
        if self.obs_terrain_height:
            n += self.n_obs_height
        return n

    def get_obs_size(self) -> int:
        return (
            self.move_feats_len
            + self.n_enemies * self.nf_en_obs
            + (self.n_agents - 1) * self.nf_al_obs
            + self.nf_own
        )

    @property
    def nf_al_state(self):
        return 4 + self.shield_bits_ally + self.unit_type_bits

    @property
    def nf_en_state(self):
        return 3 + self.shield_bits_enemy + self.unit_type_bits

    def get_state_size(self) -> int:
        if self.obs_instead_of_state:
            return self.get_obs_size() * self.n_agents
        size = self.n_agents * self.nf_al_state + self.n_enemies * self.nf_en_state
        if self.state_last_action:
            size += self.n_agents * self.n_actions
        if self.state_timestep_number:
            size += 1
        return size

    def env_info(self, args=None) -> Dict[str, Any]:
        info = {
            "state_shape": self.get_state_size(),
            "obs_shape": self.get_obs_size(),
            "n_actions": self.n_actions,
            "n_agents": self.n_agents,
            "episode_limit": self.episode_limit,
        }
        if args is not None:
            # per-entity masks over flat obs/state for imagined factorization
            # (multiagentenv.py:61-71 attaches these when supported)
            info["masks"] = self.get_obs_st_masks(args)
        return info

    # ------------------------------------------------------------------
    def reset(self, key, batch_size, test=False, index=None):
        core_state, _ = self.core.reset(key, batch_size, test=test, index=0)
        state = FlatState(
            core=core_state,
            last_action=jnp.zeros(
                (batch_size, self.n_agents, self.n_actions), jnp.float32
            ),
        )
        return state, self.observe(state)

    def _to_entity_actions(self, actions: jnp.ndarray, core: CombatState) -> jnp.ndarray:
        """flat action (a-6 = target slot) -> EntityBattle action ids.

        Attackers: 6 + enemy slot (tags are identity here). Medivacs heal the
        ally with that slot id: 6 + n_tags_e + slot (SMAC MMM convention:
        same action id addresses an ally for Medivacs, starcraft2custom
        ``get_agent_action:755-763`` with identity tags)."""
        is_medivac = self.core.is_medivac_t[core.a_type]
        tgt = jnp.clip(actions - 6, 0, None)
        ent_attack = 6 + tgt
        ent_heal = 6 + self.core.n_tags_e + tgt
        ent = jnp.where(is_medivac, ent_heal, ent_attack)
        return jnp.where(actions >= 6, ent, actions)

    def render_state(self, state: FlatState):
        return self.core.render_state(state.core)

    @property
    def map_size(self):
        return self.core.map_size

    def step(self, state: FlatState, actions: jnp.ndarray, key):
        ent_actions = self._to_entity_actions(actions.astype(jnp.int32), state.core)
        core, reward, done, info = self.core.step_state(state.core, ent_actions, key)
        a_alive = (state.core.a_health > 0) & state.core.a_active
        last = jax.nn.one_hot(actions, self.n_actions, dtype=jnp.float32)
        last = last * a_alive[..., None]
        new_state = FlatState(core=core, last_action=last)
        return new_state, self.observe(new_state), reward, done, info

    # ------------------------------------------------------------------
    def get_avail_actions(self, state: FlatState) -> jnp.ndarray:
        """(B, Na, 6+n_enemies) from the entity env's avail; Medivac rows use
        the heal block."""
        ent_avail = self.core.get_avail_actions(state.core)  # (B, Na, A_ent)
        B = ent_avail.shape[0]
        base = ent_avail[:, :, :6]
        attack = ent_avail[:, :, 6 : 6 + self.n_enemies]
        if self.core.has_medivac:
            heal = ent_avail[
                :, :, 6 + self.core.n_tags_e : 6 + self.core.n_tags_e + self.n_enemies
            ]
            is_medivac = self.core.is_medivac_t[state.core.a_type][..., None]
            attack = jnp.where(is_medivac, heal, attack)
        return jnp.concatenate([base, attack], axis=2)

    def observe(self, state: FlatState) -> Dict[str, jnp.ndarray]:
        core_env, core = self.core, state.core
        B = core.t.shape[0]
        Na, Ne = self.n_agents, self.n_enemies
        a_alive = (core.a_health > 0) & core.a_active
        e_alive = (core.e_health > 0) & core.e_active
        avail = self.get_avail_actions(state)

        d = core_env._dists(core)
        d_ae = d[:, :Na, Na:]
        d_aa = d[:, :Na, :Na]
        sight = core_env.sight_range

        # ---- enemy features (B, Na, Ne, nf_en): visible & alive gate ----
        vis_e = (d_ae < sight) & e_alive[:, None, :] & a_alive[:, :, None]
        rel_e = (core.e_pos[:, None, :, :] - core.a_pos[:, :, None, :]) / sight
        en_feats = [
            avail[:, :, 6 : 6 + Ne].astype(jnp.float32)[..., None],  # attackable
            (d_ae / sight)[..., None],
            rel_e,
        ]
        if self.obs_all_health:
            hmax = core_env.health_max[core.e_type]
            en_feats.append(
                jnp.broadcast_to(
                    (core.e_health / jnp.maximum(hmax, 1e-6))[:, None, :, None],
                    (B, Na, Ne, 1),
                )
            )
            if self.shield_bits_enemy:
                smax = jnp.maximum(core_env.shield_max[core.e_type], 1e-6)
                en_feats.append(
                    jnp.broadcast_to(
                        (core.e_shield / smax)[:, None, :, None], (B, Na, Ne, 1)
                    )
                )
        if self.unit_type_bits:
            toh = jax.nn.one_hot(
                core_env.local_type[core.e_type], self.unit_type_bits,
                dtype=jnp.float32,
            )
            en_feats.append(jnp.broadcast_to(toh[:, None], (B, Na, Ne, self.unit_type_bits)))
        enemy_block = jnp.concatenate(en_feats, -1) * vis_e[..., None]
        # first column (attackable) stays as avail (already gated by range)

        # ---- ally features (B, Na, Na, nf_al) then drop self row ----
        vis_a = (d_aa < sight) & a_alive[:, None, :] & a_alive[:, :, None]
        rel_a = (core.a_pos[:, None, :, :] - core.a_pos[:, :, None, :]) / sight
        al_feats = [
            jnp.ones((B, Na, Na, 1), jnp.float32),  # visible flag
            (d_aa / sight)[..., None],
            rel_a,
        ]
        if self.obs_all_health:
            hmax = core_env.health_max[core.a_type]
            al_feats.append(
                jnp.broadcast_to(
                    (core.a_health / jnp.maximum(hmax, 1e-6))[:, None, :, None],
                    (B, Na, Na, 1),
                )
            )
            if self.shield_bits_ally:
                smax = jnp.maximum(core_env.shield_max[core.a_type], 1e-6)
                al_feats.append(
                    jnp.broadcast_to(
                        (core.a_shield / smax)[:, None, :, None], (B, Na, Na, 1)
                    )
                )
        if self.unit_type_bits:
            toh = jax.nn.one_hot(
                core_env.local_type[core.a_type], self.unit_type_bits,
                dtype=jnp.float32,
            )
            al_feats.append(jnp.broadcast_to(toh[:, None], (B, Na, Na, self.unit_type_bits)))
        if self.obs_last_action:
            al_feats.append(
                jnp.broadcast_to(state.last_action[:, None], (B, Na, Na, self.n_actions))
            )
        ally_full = jnp.concatenate(al_feats, -1) * vis_a[..., None]
        # drop self row: gather ids != i (reference get_obs_agent al_ids loop)
        ally_block = jnp.take_along_axis(
            ally_full, self._offdiag[None, :, :, None], axis=2
        ) if Na > 1 else ally_full[:, :, :0]

        # ---- move + own ----
        move_feats = avail[:, :, 2:6].astype(jnp.float32)
        if self.obs_pathing_grid or self.obs_terrain_height:
            # grid values at the surrounding points, out-of-bounds -> 1
            # (reference get_surrounding_pathing/height, starcraft2.py:836-850)
            pts = core.a_pos[:, :, None, :] + self._surround[None, None]  # (B,Na,9,2)
            M = core_env.pathing_grid.shape[0]
            xi = jnp.floor(pts[..., 0]).astype(jnp.int32)
            yi = jnp.floor(pts[..., 1]).astype(jnp.int32)
            inb = (xi >= 0) & (xi < M) & (yi >= 0) & (yi < M)
            xi_c, yi_c = jnp.clip(xi, 0, M - 1), jnp.clip(yi, 0, M - 1)
            if self.obs_pathing_grid:
                pvals = jnp.where(
                    inb, core_env.pathing_grid[xi_c, yi_c], True
                ).astype(jnp.float32)
                move_feats = jnp.concatenate(
                    [move_feats, pvals[..., : self.n_obs_pathing]], -1
                )
            if self.obs_terrain_height:
                hvals = jnp.where(inb, core_env.terrain_height[xi_c, yi_c], 1.0)
                move_feats = jnp.concatenate([move_feats, hvals], -1)
        own = []
        if self.obs_own_health:
            hmax = core_env.health_max[core.a_type]
            own.append((core.a_health / jnp.maximum(hmax, 1e-6))[..., None])
            if self.shield_bits_ally:
                smax = jnp.maximum(core_env.shield_max[core.a_type], 1e-6)
                own.append((core.a_shield / smax)[..., None])
        if self.unit_type_bits:
            own.append(
                jax.nn.one_hot(
                    core_env.local_type[core.a_type], self.unit_type_bits,
                    dtype=jnp.float32,
                )
            )
        own_block = (
            jnp.concatenate(own, -1) * a_alive[..., None]
            if own
            else jnp.zeros((B, Na, 0), jnp.float32)
        )
        if self.obs_timestep_number:
            ts = jnp.broadcast_to(
                (core.t / self.episode_limit)[:, None, None], (B, Na, 1)
            ).astype(jnp.float32)
            own_block = jnp.concatenate([own_block, ts], -1)

        obs = jnp.concatenate(
            [
                move_feats.reshape(B, Na, -1),
                enemy_block.reshape(B, Na, -1),
                ally_block.reshape(B, Na, -1),
                own_block,
            ],
            axis=2,
        )
        # dead agents observe zeros (reference get_obs_agent: unit.health > 0)
        obs = obs * a_alive[..., None]

        if self.obs_instead_of_state:
            # state = concatenated per-agent observations
            # (reference starcraft2.py:1148-1153)
            return {
                "obs": obs,
                "state": obs.reshape(B, -1),
                "avail_actions": avail,
            }

        # ---- global state (reference get_state:1144-1240) ----
        ctr = core_env.center
        msz = core_env.map_size
        hmax_a = core_env.health_max[core.a_type]
        max_cd = core_env.cooldown_frames[core.a_type]
        is_med = core_env.is_medivac_t[core.a_type]
        cd_or_energy = jnp.where(
            is_med, core.a_energy / jnp.maximum(max_cd, 1e-6),
            core.a_cd / jnp.maximum(max_cd, 1e-6),
        )
        al_state = [
            (core.a_health / jnp.maximum(hmax_a, 1e-6))[..., None],
            cd_or_energy[..., None],
            (core.a_pos - ctr[None, None]) / msz,
        ]
        if self.shield_bits_ally:
            smax = jnp.maximum(core_env.shield_max[core.a_type], 1e-6)
            al_state.append((core.a_shield / smax)[..., None])
        if self.unit_type_bits:
            al_state.append(
                jax.nn.one_hot(
                    core_env.local_type[core.a_type], self.unit_type_bits,
                    dtype=jnp.float32,
                )
            )
        al_state = jnp.concatenate(al_state, -1) * a_alive[..., None]

        hmax_e = core_env.health_max[core.e_type]
        en_state = [
            (core.e_health / jnp.maximum(hmax_e, 1e-6))[..., None],
            (core.e_pos - ctr[None, None]) / msz,
        ]
        if self.shield_bits_enemy:
            smax = jnp.maximum(core_env.shield_max[core.e_type], 1e-6)
            en_state.append((core.e_shield / smax)[..., None])
        if self.unit_type_bits:
            en_state.append(
                jax.nn.one_hot(
                    core_env.local_type[core.e_type], self.unit_type_bits,
                    dtype=jnp.float32,
                )
            )
        en_state = jnp.concatenate(en_state, -1) * e_alive[..., None]

        parts = [al_state.reshape(B, -1), en_state.reshape(B, -1)]
        if self.state_last_action:
            parts.append(state.last_action.reshape(B, -1))
        if self.state_timestep_number:
            parts.append((core.t / self.episode_limit)[:, None].astype(jnp.float32))
        st = jnp.concatenate(parts, axis=1)

        return {"obs": obs, "state": st, "avail_actions": avail}

    # ------------------------------------------------------------------
    def get_obs_st_masks(self, args):
        """Per-entity masks over flat obs/state vectors
        (reference ``starcraft2.py:854-965``), computed once host-side."""
        Na, Ne = self.n_agents, self.n_enemies
        nf_al, nf_en, nf_own = self.nf_al_obs, self.nf_en_obs, self.nf_own
        move_len = self.move_feats_len
        obs_size = self.get_obs_size()
        if getattr(args, "obs_last_action", False):
            obs_size += self.n_actions
        if getattr(args, "obs_agent_id", False):
            obs_size += Na
        obs_masks = np.zeros((Na + Ne, Na, obs_size), np.float32)
        raw_masks = np.zeros((Na + Ne, Na, self.get_obs_size()), np.float32)
        for i in range(Na + Ne):
            ally = i < Na
            for j in range(Na):
                move = np.zeros(move_len, np.float32)
                en = np.zeros((Ne, nf_en), np.float32)
                al = np.zeros((max(Na - 1, 0), nf_al), np.float32)
                ownm = np.zeros(nf_own, np.float32)
                last_ac = np.zeros(self.n_actions, np.float32)
                agent_id = np.ones(Na, np.float32)
                if i == j:
                    move[:] = 1
                    ownm[:] = 1
                    last_ac[:] = 1
                elif ally:
                    al[i if i < j else i - 1] = 1
                else:
                    en[i - Na] = 1
                cur = np.concatenate([move, en.ravel(), al.ravel(), ownm])
                raw_masks[i, j] = cur
                if getattr(args, "obs_last_action", False):
                    cur = np.append(cur, last_ac)
                if getattr(args, "obs_agent_id", False):
                    cur = np.append(cur, agent_id)
                obs_masks[i, j] = cur

        if self.obs_instead_of_state:
            # the state IS the concatenated raw agent observations, so the
            # per-entity state masks are the raw obs masks laid end to end.
            # Divergence from reference starcraft2.py:928-930, which reshapes
            # the agent-INPUT masks (obs ++ last-action ++ agent-id blocks):
            # that width only matches the state when obs_last_action and
            # obs_agent_id are both off — with either on, the reference's
            # mixer would crash on the width mismatch. We mask the raw-obs
            # state the env actually serves.
            return obs_masks, raw_masks.reshape(Na + Ne, -1)

        state_masks = np.zeros((Na + Ne, self.get_state_size()), np.float32)
        for i in range(Na + Ne):
            al = np.zeros((Na, self.nf_al_state), np.float32)
            en = np.zeros((Ne, self.nf_en_state), np.float32)
            last = np.zeros((Na, self.n_actions), np.float32)
            if i < Na:
                al[i] = 1
                last[i] = 1
            else:
                en[i - Na] = 1
            cur = np.concatenate([al.ravel(), en.ravel()])
            if self.state_last_action:
                cur = np.append(cur, last.ravel())
            if self.state_timestep_number:
                cur = np.append(cur, np.ones(1, np.float32))
            state_masks[i] = cur
        return obs_masks, state_masks
