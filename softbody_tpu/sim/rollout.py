"""Differentiable episode runner: one jit'd ``lax.scan`` replaces the reference's
host-driven 3000-launch loop + ``wp.Tape`` (sim.py:341-372).

Memory model: the reference stores the FULL trajectory — (frames+1) copies of 5
state fields — so the tape can reach it (sim.py:84-95).  Here the step function
is wrapped in ``jax.checkpoint``, so reverse-mode recomputes each step's
internals from its (pos, vel) carry: O(T) positions instead of O(T x fields),
exactly the recompute pattern the Taichi backend hand-rolls at
sim_taichi.py:184-200.

Loss accumulates inside the scan carry at the sampled frames (sim.py:359-361):
masked add of the current frame's loss term, target row selected with a clamped
dynamic index — no host round-trips anywhere in the episode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..core.types import Materials, ParticleState, Scene
from ..ops.collision import ground_penalty
from ..ops.elasticity import compute_ratio, elastic_forces


def _elastic(pos, ratio, scene: Scene, cfg: SimConfig):
    """Backend dispatch for the elastic-force evaluation."""
    if cfg.backend == "gather":
        f, _ = elastic_forces(pos, ratio, scene.materials, scene.topology, cfg)
        return f
    if cfg.backend == "blocked":
        from .blocked import elastic_forces_blocked

        return elastic_forces_blocked(pos, ratio, scene.materials, scene, cfg)
    if cfg.backend == "pallas":
        from .blocked import elastic_forces_pallas

        return elastic_forces_pallas(pos, ratio, scene.materials, scene, cfg)
    raise ValueError(f"unknown backend {cfg.backend!r}")


def total_force(pos, vel, f_el, mats: Materials, cfg: SimConfig, scene: Scene = None):
    """external + elastic - damping*v + collision (part_1/part_2, sim.py:246-258)
    + optional implicit-obstacle penalty (ops/obstacles.py, beyond-reference)."""
    f = mats.external + f_el - cfg.damping * vel
    if cfg.collision:
        f = f + ground_penalty(pos, cfg, vel)
    if scene is not None and scene.obstacles is not None:
        from ..ops.obstacles import penalty_force

        f = f + penalty_force(scene.obstacles, pos)
    if scene is not None and scene.contact is not None:
        from ..ops.contact import contact_forces

        if cfg.contact_check:
            f_c, ovf = contact_forces(pos, scene.contact, with_overflow=True)
            jax.debug.callback(_warn_contact_overflow, ovf,
                               scene.contact.cap, ordered=False)
            f = f + f_c
        else:
            f = f + contact_forces(pos, scene.contact)
    return f


def _warn_contact_overflow(ovf, cap):
    """Host-side overflow sink: an overfull contact cell means candidates were
    DROPPED (ops/contact.py cap contract) — warn once per process instead of
    letting the episode continue on silently incomplete forces."""
    global _overflow_warned
    if bool(ovf) and not _overflow_warned:
        _overflow_warned = True
        import warnings

        warnings.warn(
            f"dynamic contact cell occupancy exceeded cap={cap}: candidates "
            "were dropped and contact forces are incomplete; rebuild the "
            "contact grid with a larger cap or smaller cell_scale",
            RuntimeWarning, stacklevel=2)


_overflow_warned = False


def step(state: ParticleState, ratio, scene: Scene, cfg: SimConfig,
         elastic_fn=None) -> ParticleState:
    """One physics step.

    trapezoidal (Warp, sim.py:246-258): part_1 advances positions with the
    carried forces, forces are recomputed at the new positions, part_2 averages.
    symplectic (Taichi, sim_taichi.py:167-172): forces at current state, then
    semi-implicit Euler.

    ``elastic_fn(pos) -> forces`` overrides the backend dispatch — the SPMD
    halo path (parallel/halo.py) routes its exchanged force evaluation through
    this SAME integrator body, so step semantics live in exactly one place.
    """
    el = ((lambda p: _elastic(p, ratio, scene, cfg))
          if elastic_fn is None else elastic_fn)
    mats = scene.materials
    dt = cfg.dt
    m = mats.mass[:, None]
    pos, vel, f_el = state

    if cfg.integrator == "trapezoidal":
        force1 = total_force(pos, vel, f_el, mats, cfg, scene)
        pos_n = pos + (dt * vel + 0.5 * dt * dt * force1 / m) * mats.free
        f_el_n = el(pos_n)
        # the velocity-damping term reuses v_t in both halves (sim.py:256-257)
        force2 = total_force(pos_n, vel, f_el_n, mats, cfg, scene)
        vel_n = vel + dt * (force1 + force2) / (2.0 * m) * mats.free
        return ParticleState(pos_n, vel_n, f_el_n)

    # symplectic Euler (advance, sim_taichi.py:167-172)
    f_el_now = el(pos)
    force = total_force(pos, vel, f_el_now, mats, cfg, scene)
    vel_n = vel + dt * force / m * mats.free
    pos_n = pos + dt * vel_n * mats.free
    return ParticleState(pos_n, vel_n, f_el_now)


def initial_state(scene: Scene, ratio, cfg: SimConfig,
                  elastic_fn=None) -> ParticleState:
    """startup kernel + initial force evaluation (sim.py:342,349-351,261-266)."""
    pos = scene.rest_position
    vel = jnp.broadcast_to(
        jnp.asarray(cfg.initial_velocity, dtype=pos.dtype), pos.shape
    )
    if cfg.integrator == "trapezoidal":
        el = ((lambda p: _elastic(p, ratio, scene, cfg))
              if elastic_fn is None else elastic_fn)
        f_el = el(pos)
    else:
        f_el = jnp.zeros_like(pos)
    return ParticleState(pos, vel, f_el)


def frame_loss(state: ParticleState, tp, tv, cfg: SimConfig):
    """Per-frame loss term: |p - p*|^2 + dt |v - v*|^2 (compute_loss, sim.py:269-273);
    Taichi final-frame variant drops the dt weight (sim_taichi.py:210-214)."""
    dp = state.position - tp
    dv = state.velocity - tv
    w = cfg.dt if cfg.loss_mode == "sampled" else 1.0
    return jnp.sum(dp * dp) + w * jnp.sum(dv * dv)


# ---- compensated loss accumulation -------------------------------------------
# The episode loss is a sum of ~100 f32 frame terms.  Accumulated naively in
# f32, the total (~46 at reference scale) has a quantum of ~4e-6 — scipy's f64
# L-BFGS-B line search then sees bit-identical f for any step whose true
# improvement is smaller, reads zero reduction, and aborts after one iteration
# (the out/inverse100k stall: 13 consecutive bit-identical evals in run.log).
# A Neumaier two-float carry keeps the rounding residual, restoring ~per-term
# resolution (~3e-8 at loss 46) with two extra scalar ops per step and no f64
# on device.  The gradient is seeded through the hi term only, so grads are
# bit-identical to the plain f32 accumulator's.

def _acc_init(dtype):
    z = jnp.zeros((), dtype)
    return (z, z)


def _acc_add(acc, term):
    hi, lo = acc
    t = hi + term
    lo = lo + jnp.where(
        jnp.abs(hi) >= jnp.abs(term), (hi - t) + term, (term - t) + hi
    )
    return (t, lo)


def acc_scalar(acc):
    """Collapse the (hi, lo) pair to a device scalar (legacy f32 resolution)."""
    return acc[0] + acc[1]


def acc_float(acc) -> float:
    """Collapse the (hi, lo) pair on host in f64 — full compensated precision."""
    return float(acc[0]) + float(acc[1])


def rollout(x, scene: Scene, cfg: SimConfig, target_p=None, target_v=None,
            n_steps=None, record_every: int | None = None, acc_pair=False):
    """Run an episode.  Differentiable wrt ``x`` (and the scene pytree).

    Returns (loss, final_state, recorded) where ``recorded`` is
    (positions, velocities) stacked every ``record_every`` steps (or None).
    If targets are None the loss is 0 (pure forward / target generation).
    ``acc_pair=True`` returns the loss as the Neumaier (hi, lo) pair instead
    of a collapsed f32 scalar (see _acc_add above).
    """
    n_steps = cfg.frames if n_steps is None else n_steps
    ratio = compute_ratio(x, cfg)
    state0 = initial_state(scene, ratio, cfg)

    have_targets = target_p is not None
    if not have_targets:
        dtype = scene.rest_position.dtype
        target_p = jnp.zeros((1,) + scene.rest_position.shape, dtype)
        target_v = jnp.zeros((1,) + scene.rest_position.shape, dtype)
    n_targets = target_p.shape[0]
    interval = max(n_steps // n_targets, 1)

    step_fn = partial(step, scene=scene, cfg=cfg)
    if cfg.remat:
        step_fn = jax.checkpoint(step_fn)

    if have_targets:
        body = _episode_body(step_fn, ratio, target_p, target_v, cfg,
                             n_steps, interval)
    else:
        def body(carry, f):
            state, acc = carry
            return (step_fn(state, ratio), acc), None

    zero = _acc_init(scene.rest_position.dtype)
    if record_every:
        # scan in chunks, recording the state at the end of each chunk
        assert n_steps % record_every == 0

        def chunk(carry, k):
            carry, _ = jax.lax.scan(
                body, carry, k * record_every + jnp.arange(record_every)
            )
            return carry, (carry[0].position, carry[0].velocity)

        (state, acc), rec = jax.lax.scan(
            chunk, (state0, zero), jnp.arange(n_steps // record_every)
        )
        return (acc if acc_pair else acc_scalar(acc)), state, rec

    carry = (state0, zero)
    chunk_len = _remat_chunk(cfg, n_steps)
    if chunk_len:
        # sqrt-nested checkpointing: the outer scan saves only chunk-boundary
        # states (T/c of them); each chunk's backward recomputes its forward,
        # saving c per-step carries.  Peak residual memory drops from O(T)
        # states to O(T/c + c) — at T=3000, 100k slots, linear remat stores
        # ~13 GB of (pos, vel, f_el) carries and OOMs a 16 GB v5e; nested at
        # c=50 stores ~0.5 GB.  Cost: one extra forward recompute per step in
        # the backward pass (the standard recursive-checkpoint trade).
        n_bulk = (n_steps // chunk_len) * chunk_len

        @jax.checkpoint
        def chunk_body(c, fs):
            c, _ = jax.lax.scan(body, c, fs)
            return c, None

        carry, _ = jax.lax.scan(
            chunk_body, carry, jnp.arange(n_bulk).reshape(-1, chunk_len))
        if n_bulk < n_steps:  # tail too short to matter for memory
            carry, _ = jax.lax.scan(
                body, carry, n_bulk + jnp.arange(n_steps - n_bulk))
    else:
        carry, _ = jax.lax.scan(body, carry, jnp.arange(n_steps))
    state, acc = carry
    return (acc if acc_pair else acc_scalar(acc)), state, None


def _episode_body(step_fn, ratio, tp, tv, cfg: SimConfig, n_steps, interval):
    """Scan body over GLOBAL step indices with target-frame loss accumulation
    (sim.py:352-361 semantics) — shared by rollout() and the chunked runner."""
    n_targets = tp.shape[0]

    def body(carry, f):
        state, acc = carry
        state = step_fn(state, ratio)
        frame = f + 1
        t_idx = jnp.clip(frame // interval - 1, 0, n_targets - 1)
        term = frame_loss(state, tp[t_idx], tv[t_idx], cfg)
        if cfg.loss_mode == "final":
            hit = frame == n_steps
        else:
            hit = (frame % interval == 0) & (frame // interval <= n_targets)
        acc = _acc_add(acc, jnp.where(hit, term, 0.0))
        return (state, acc), None

    return body


def _chunk_primal(state, x, k0, tp, tv, scene: Scene, cfg: SimConfig,
                  length: int, n_steps: int):
    """One episode chunk: ``length`` steps starting at global step ``k0``.
    Returns (state_out, chunk-loss (hi, lo) pair).  Differentiable wrt
    (state, x)."""
    ratio = compute_ratio(x, cfg)
    step_fn = partial(step, scene=scene, cfg=cfg)
    if cfg.remat:
        step_fn = jax.checkpoint(step_fn)
    interval = max(n_steps // tp.shape[0], 1)
    body = _episode_body(step_fn, ratio, tp, tv, cfg, n_steps, interval)
    zero = _acc_init(scene.rest_position.dtype)
    (state, acc), _ = jax.lax.scan(body, (state, zero),
                                   k0 + jnp.arange(length))
    return state, acc


def episode_value_and_grad_chunked(scene: Scene, cfg: SimConfig,
                                   n_chunks: int, n_steps=None):
    """Reference-length episode gradients in BOUNDED device programs.

    Mathematically identical to ``jax.value_and_grad(loss_fn)`` — the chain
    rule is applied at chunk boundaries on the host — but each chunk's
    forward and backward runs as its own dispatch, so no single device
    program exceeds the worker's wall-clock watchdog (measured on the axon
    v5e worker: ~45 s dispatches survive, ~80 s dispatches kill the worker;
    a 3000-step fwd+bwd at 100k particles is ~80 s in one program).
    The returned loss is a HOST f64 float combining each chunk's compensated
    (hi, lo) accumulator — resolution ~3e-8 at loss ~46 instead of the f32
    quantum ~4e-6 (the round-3 line-search plateau).

    Memory: only the n_chunks boundary states are kept (device-resident,
    ~4 MB each at 100k) — the per-chunk backward relies on the per-step
    ``jax.checkpoint`` remat like the single-dispatch path.

    Returns ``f(x, target_p, target_v) -> (loss, grad)`` issuing
    2*n_chunks + 2 dispatches.
    """
    import numpy as np

    n_steps = cfg.frames if n_steps is None else n_steps
    n_chunks = max(1, min(int(n_chunks), n_steps))
    base = n_steps // n_chunks
    sizes = [base + (1 if i < n_steps % n_chunks else 0)
             for i in range(n_chunks)]
    k0s = np.cumsum([0] + sizes[:-1]).tolist()

    @partial(jax.jit, static_argnames=("length",))
    def fwd_chunk(state, x, k0, tp, tv, sc, length):
        return _chunk_primal(state, x, k0, tp, tv, sc, cfg, length, n_steps)

    @partial(jax.jit, static_argnames=("length",))
    def bwd_chunk(state, x, k0, tp, tv, sc, cot_state, length):
        prim = lambda s, xx: _chunk_primal(s, xx, k0, tp, tv, sc, cfg,
                                           length, n_steps)
        (_, acc), vjp = jax.vjp(prim, state, x)
        # seed the hi accumulator only: the lo (compensation) term is a
        # rounding residual, not part of the mathematical loss
        ds, dx = vjp((cot_state,
                      (jnp.ones((), acc[0].dtype), jnp.zeros((), acc[1].dtype))))
        return ds, dx

    @jax.jit
    def init_fn(x, sc):
        return initial_state(sc, compute_ratio(x, cfg), cfg)

    @jax.jit
    def init_bwd(x, sc, cot_state):
        _, vjp = jax.vjp(
            lambda xx: initial_state(sc, compute_ratio(xx, cfg), cfg), x)
        (dx,) = vjp(cot_state)
        return dx

    def f(x, target_p, target_v):
        x = jnp.asarray(x, scene.rest_position.dtype)
        state = init_fn(x, scene)
        states, loss = [], 0.0  # host f64: keeps the compensated precision
        for k0, length in zip(k0s, sizes):
            states.append(state)
            state, acc = fwd_chunk(state, x, jnp.int32(k0), target_p,
                                   target_v, scene, length=length)
            loss = loss + acc_float(acc)
        cot = jax.tree.map(jnp.zeros_like, state)
        grad = jnp.zeros_like(x)
        for k0, length, s_in in reversed(list(zip(k0s, sizes, states))):
            cot, dx = bwd_chunk(s_in, x, jnp.int32(k0), target_p, target_v,
                                scene, cot, length=length)
            grad = grad + dx
        grad = grad + init_bwd(x, scene, cot)
        return loss, grad

    return f


def forward_chunked(x, scene: Scene, cfg: SimConfig, n_steps, chunk_len,
                    record_every=None):
    """Forward episode as a host loop of bounded dispatches (same watchdog
    rationale as episode_value_and_grad_chunked; a 3000-step forward at 1M
    particles is minutes in one program).  Returns (final_state, recorded
    positions at every ``record_every`` boundary; record_every must be a
    chunk_len multiple)."""
    n_steps = cfg.frames if n_steps is None else n_steps
    chunk_len = max(1, min(int(chunk_len), n_steps))
    ratio0 = compute_ratio(jnp.asarray(x, scene.rest_position.dtype), cfg)
    state = initial_state(scene, ratio0, cfg)
    if record_every:
        assert record_every % chunk_len == 0, (record_every, chunk_len)

    @partial(jax.jit, static_argnames=("length",))
    def fwd_chunk(st, xv, sc, length):
        ratio = compute_ratio(xv, cfg)
        step_fn = partial(step, scene=sc, cfg=cfg)

        def body(s, _):
            return step_fn(s, ratio), None

        st, _ = jax.lax.scan(body, st, None, length=length)
        return st

    recorded = []
    done = 0
    while done < n_steps:
        length = min(chunk_len, n_steps - done)
        state = fwd_chunk(state, x, scene, length=length)
        done += length
        if record_every and (done % record_every == 0 or done == n_steps):
            recorded.append(state.position)
    return state, recorded


def _remat_chunk(cfg: SimConfig, n_steps: int) -> int:
    """Resolve cfg.remat_chunk: 0 = linear remat, >0 = explicit chunk length,
    -1 = auto (~sqrt(T) once the episode is long enough for the linear-remat
    residuals to threaten HBM)."""
    if not cfg.remat or cfg.remat_chunk == 0:
        return 0
    if cfg.remat_chunk > 0:
        return min(cfg.remat_chunk, n_steps)
    return round(n_steps ** 0.5) if n_steps >= 2048 else 0


def loss_fn(x, scene: Scene, cfg: SimConfig, target_p, target_v, n_steps=None):
    """Scalar episode loss — the quantity L-BFGS minimizes (sim.py:379-396)."""
    loss, _, _ = rollout(x, scene, cfg, target_p, target_v, n_steps=n_steps)
    return loss


def value_and_grad_fn(scene: Scene, cfg: SimConfig, n_steps=None):
    """(loss, dloss/dx) closure — replaces diff_sim + tape.backward
    (sim.py:341-372).  The loss comes back as a host float combining the
    compensated (hi, lo) accumulator in f64 — resolution ~per-frame-term ulp
    instead of the f32 quantum of the total (see _acc_add)."""
    def f(x, target_p, target_v):
        (hi, lo), _, _ = rollout(x, scene, cfg, target_p, target_v,
                                 n_steps=n_steps, acc_pair=True)
        return hi, lo

    vg = jax.jit(jax.value_and_grad(f, has_aux=True))

    def g(x, target_p, target_v):
        (hi, lo), grad = vg(x, target_p, target_v)
        return float(hi) + float(lo), grad

    return g
