"""Render a saved replay (.npz from ``save_replay=True`` eval runs) to video.

The reference saves SC2Replay files playable in the game client
(``starcraft2custom.py`` save_replay); the stand-in's replay is the recorded
render-state trajectory — this script is the 'client' that plays it back.

Usage: python scripts/replay_to_video.py results/replays/<run>.npz [out.mp4] [env_index]
"""
import os
import sys

sys.path.insert(0, ".")


def main():
    import numpy as np

    from refil_tpu.envs.combat import render as crender

    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else path.rsplit(".", 1)[0] + ".mp4"
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    data = np.load(path)
    T = data[list(data.keys())[0]].shape[0]
    recorded = [{k: data[k][t] for k in data.files} for t in range(T)]
    # map size isn't stored in the replay; infer from the position extent
    pos = data["pos"]
    map_size = float(np.ceil(pos.max() + 2))
    frames = crender.frames_for_env(recorded, b, map_size)
    written = crender.save_video(out, frames, fps=4)
    print(f"wrote {written} ({len(frames)} frames, env {b})")


if __name__ == "__main__":
    main()
