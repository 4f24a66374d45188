"""CLI entry point.

Usage (mirrors the reference, ``README.md:30`` / ``src/main.py``):

    python -m refil_tpu.main --config=refil_group_matching \
        --env-config=group_matching with lr=0.001 seed=7 env_args.n_agents=4

Sacred is replaced by a dependency-free loader (``refil_tpu.config``); the
``with k=v`` override syntax is kept.
"""
from __future__ import annotations

import sys

from .config import load_config
from .run import run


def parse_cli(argv):
    alg = None
    env = None
    overrides = []
    in_with = False
    for tok in argv:
        if tok.startswith("--config="):
            alg = tok.split("=", 1)[1]
        elif tok.startswith("--env-config="):
            env = tok.split("=", 1)[1]
        elif tok == "with":
            in_with = True
        elif in_with:
            overrides.append(tok)
        else:
            raise SystemExit(f"Unrecognised argument {tok!r}")
    return alg, env, overrides


def main(argv=None) -> None:
    alg, env, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    config = load_config(alg=alg, env=env, overrides=overrides)
    run(config)


if __name__ == "__main__":
    main()
