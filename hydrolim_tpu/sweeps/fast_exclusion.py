"""Production EXCLUSION sweep runner on the fused Pallas slot kernel.

Completes the user-facing story of ops/pallas_exclusion.py: round 2's fused
exclusion kernel was bench/test-only — actual sweeps ran on the XLA slot
engine (particles/lattice_gas_k.py).  This module advances the (β-grid ×
replicas) batch one obs_dt frame per kernel invocation (slot state resident
in VMEM across the Δt sub-steps), computing the frame observables between
invocations — the same recording granularity and return contract as
``run_lattice_gas_k`` but at fused-kernel throughput.

Tracer identity rides the slot payloads: the kernel treats slot values as
signed payloads (sign = spin, magnitude = particle id), so per-particle
displacement series — hence D_eff (``PARTICLE_solver_BIOLOGY_EXCLUSION_
sweep_beta.py:500-525`` semantics) — come out exactly, with no extra kernel
state.  Falls back to the XLA slot engine automatically off-TPU
(``engine='auto'``).

Supported configuration class (the reference flagship,
PARTICLE_solver_BIOLOGY_EXCLUSION.py:55-94): site exclusion with capacity
K ≤ 8, periodic or non-periodic, plus_forward or bidirectional hops, global
or Gaussian local m, default CW flip rate, no anchors/binding, no crowding
suppression.  Everything else routes to the XLA engines.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hydrolim_tpu.core.config import ParticleConfig, ParticleParams
from hydrolim_tpu.particles.run import substeps_for
from hydrolim_tpu.fields.magnetization import build_mfield_op
from hydrolim_tpu.particles.lattice_gas import LatticeGasFrames, _lg_record_counts

# frames per block in the record post-pass (bounds the simultaneous
# per-frame record intermediates; see run_exclusion_sweep)
_REC_CHUNK = 128


def default_device_is_tpu() -> bool:
    """True iff jitted programs will actually run on a TPU.  Checks the
    pinned default device first: the axon plugin lists the TPU in
    ``jax.devices()`` even when ``jax_default_device`` pins CPU (CLAUDE.md),
    and a Pallas call lowered for the CPU default device fails."""
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            # recent JAX also accepts a platform *string* here
            platform = dd if isinstance(dd, str) else dd.platform
            return platform not in ("cpu",)
        return jax.devices()[0].platform not in ("cpu",)
    except RuntimeError:
        return False


def is_pallas_exclusion_path(config: ParticleConfig) -> bool:
    """True iff the fused kernel supports this configuration."""
    return (config.exclusion
            and config.K <= 8
            and config.anchor_positions is None
            and not config.crowding_suppresses_rates
            and config.flip_rate_fn is None)


def _record_fn(config: ParticleConfig, record_fft: bool):
    mfield_op = build_mfield_op(config.L, config.dx,
                                config.local_kernel_sigma, config.periodic)
    K, L = config.K, config.L

    def rec(slots_padded, tags, valid):
        """(B, Kp, Lp) payload slots → batched frame observables + raw
        tracer sites (B, n_t; -1 for invalid tags)."""
        slots = slots_padded[..., :K, :L]
        counts_p = (slots > 0).sum(-2).astype(jnp.float32)
        counts_m = (slots < 0).sum(-2).astype(jnp.float32)
        frame = _lg_record_counts(config, mfield_op, counts_p, counts_m,
                                  record_fft)
        if tags.shape[-1] == 0:
            return frame, jnp.zeros(slots.shape[:-2] + (0,), jnp.int32)
        # id → site lookup: scatter each payload's lane index into a table
        # indexed by |payload| (index 0 collects empty-slot writes — never
        # read, tags are >= 1)
        B = slots.shape[0]
        ids = jnp.abs(slots).reshape(B, -1)                     # (B, K*L)
        lane = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32), (B, K, L)).reshape(B, -1)
        site_of = jnp.zeros((B, K * L + 1), jnp.int32)
        site_of = site_of.at[jnp.arange(B)[:, None], ids].set(lane)
        raw = jnp.take_along_axis(site_of, tags, axis=-1)
        return frame, jnp.where(valid, raw, -1)

    return rec


def _init_tags(slots0: np.ndarray, key, n_tracers: int):
    """Per-replica tracer ids: n_tracers distinct occupied payloads.
    Returns ``(tags (B, n_t) int32, valid (B, n_t) bool)`` — surplus tags
    (fewer occupied slots than requested) are invalid, like
    lattice_gas_k._init_tracers_k."""
    B = slots0.shape[0]
    flat = jnp.abs(jnp.asarray(slots0)).reshape(B, -1)
    bits = jax.random.bits(key, flat.shape, jnp.uint32) >> 1
    keys_arr = jnp.where(flat != 0, bits, jnp.uint32(0))
    vals, idx = jax.lax.top_k(keys_arr, n_tracers)
    tags = jnp.take_along_axis(flat, idx, axis=-1).astype(jnp.int32)
    return tags, vals > 0


def unwrap_tracer_sites(raw: np.ndarray, L: int, periodic: bool) -> np.ndarray:
    """(M, B, n_t) raw sites (-1 invalid; raw sites live in [0, L)) →
    unwrapped positions (int32, ``TRACER_INVALID`` where invalid — unwrapped
    positions are signed, so -1 cannot double as the sentinel).  Periodic
    wraps are resolved by minimal image per frame — valid while per-frame
    |displacement| < L/2 (rates·obs_dt ≪ L for every reference workload)."""
    from hydrolim_tpu.particles.lattice_gas import TRACER_INVALID

    raw = np.asarray(raw)
    if raw.shape[-1] == 0:
        return raw.astype(np.int32)
    valid = raw >= 0
    if periodic and raw.shape[0] >= 2:
        dr = raw[1:] - raw[:-1]
        dr = (dr + L // 2) % L - L // 2
        unwrapped = np.concatenate(
            [raw[:1], raw[:1] + np.cumsum(dr, axis=0)], axis=0)
    else:
        unwrapped = raw
    return np.where(valid, unwrapped, TRACER_INVALID).astype(np.int32)


def _pick_r_batch(config: ParticleConfig, B: int) -> int:
    """Replicas per kernel grid program (VERDICT r2 #6).

    Measured effect (K=3 flagship, B=16): 4.9e8 → 6.1e8 particle-steps/s —
    R-batching amortizes grid/launch overhead and shares the conv matrix
    across one (2R, Lp) matmul, but does NOT fill the idle sublanes:
    Mosaic tiles the last two dims of each block, so each replica's
    (Kp, Lp) stack stays padded to 8 sublane rows regardless of R (the
    ROADMAP sublane write-off; the XLA slot engine's (B·K, L) layout wins
    batched workloads).  Budget: the conv matrix (4·Lp² when local-m) plus
    R × the step's working set — the (R, 3Kp, Lp) compaction intermediates
    dominate at ~40 live (Kp, Lp) int32 tiles per replica — inside ~14 MB
    of VMEM."""
    from hydrolim_tpu.ops.pallas_exclusion import _pad_lanes, _pad_rows

    from hydrolim_tpu.ops.pallas_exclusion import narrow_smooth_radius

    Kp, Lp = _pad_rows(config.K), _pad_lanes(config.L)
    budget = 14 * 2 ** 20
    fixed = _conv_vmem_bytes(config, narrow_smooth_radius(config))
    per_rep = 40 * Kp * Lp * 4
    for cand in (8, 4, 2):
        if cand <= B and fixed + cand * per_rep + 2 * 2 ** 20 <= budget:
            return cand
    return 1


def _conv_vmem_bytes(config: ParticleConfig, smooth_radius: int) -> int:
    """VMEM bytes of the resident smoothing operand: the packed (776, 512)
    narrow slab, the dense (Lp, Lp) matrix, or nothing (global m)."""
    from hydrolim_tpu.ops.pallas_exclusion import _pad_lanes

    if config.local_kernel_sigma <= 0:
        return 0
    if smooth_radius > 0:
        return 776 * 512 * 4
    Lp = _pad_lanes(config.L)
    return 4 * Lp * Lp


def _pick_r_batch_rb(B: int, config: Optional[ParticleConfig] = None) -> int:
    """Replicas per grid program for the replica-banked kernel: fill the
    sublane axis (multiples of 8) up to 32 rows (4 tiles) per program,
    preferring an exact divisor of the true batch to avoid padding.

    VMEM gate: the step's working set is ~40 live K-row (R, Lp) tiles per
    replica (the 3K-row compaction intermediates dominate, as in
    ``_pick_r_batch``) plus the (Lp, Lp) conv matrix — keep R inside the
    same ~14 MB budget so K=8 configs don't blow VMEM at R=32."""
    r_max = 32
    if config is not None:
        from hydrolim_tpu.ops.pallas_exclusion import (
            _pad_lanes,
            narrow_smooth_radius,
        )

        Lp = _pad_lanes(config.L)
        budget = 14 * 2 ** 20
        fixed = _conv_vmem_bytes(config, narrow_smooth_radius(config))
        per_rep = 40 * config.K * Lp * 4
        while r_max > 8 and fixed + r_max * per_rep + 2 * 2 ** 20 > budget:
            r_max //= 2
    for cand in (32, 16, 8):
        if cand <= r_max and B % cand == 0:
            return cand
    return min(r_max, -(-B // 8) * 8)


#: reproducibility record of the most recent fused run (ADVICE r3): with
#: r_batch > 1 one PRNG seed is consumed per grid PROGRAM and replicas
#: within a program share (R, Kp, Lp) draw blocks, so trajectories at a
#: fixed seed depend on the chosen R.  Callers that persist results should
#: save this alongside (sweeps/beta_sweep stores it in the npz) and replay
#: with an explicit ``r_batch=`` to reproduce across heuristic changes.
last_run_info: dict = {}


def _shard_mapped_runner(fn, mesh, rec, sl0, tags, valid, *, has_noise):
    """``jit(shard_map(fn))`` over the sweep mesh's replica axis for the
    fused scan runners (signature ``fn(sl0, scal, seeds0, tags, valid,
    conv_j, xs) -> (sl, frames, raws)``): batched operands split on the
    mesh axis, the conv matrix replicated, and — with injected noise — the
    noise's program axis (dim 1 of the xs noise block) split with the
    replicas so each shard consumes exactly its own programs' pre-drawn
    bits."""
    from jax.sharding import PartitionSpec as P

    ax = mesh.axis_names[0]
    bspec, fspec, repl = P(ax), P(None, ax), P()
    example_frames, _ = jax.eval_shape(
        rec, jax.ShapeDtypeStruct(sl0.shape, sl0.dtype),
        jax.ShapeDtypeStruct(tags.shape, tags.dtype),
        jax.ShapeDtypeStruct(valid.shape, valid.dtype))
    frames_spec = jax.tree.map(lambda _: fspec, example_frames)
    xs_spec = (repl, P(None, ax)) if has_noise else repl
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(bspec, bspec, bspec, bspec, bspec, repl, xs_spec),
        out_specs=(bspec, frames_spec, fspec),
        # pallas_call's out ShapeDtypeStructs carry no vma annotation;
        # the wrapper is pure per-shard DP, so the varying-across-mesh
        # check has nothing to verify anyway
        check_vma=False))


def _run_fused_checkpointed(config, kernel_fn, rec, sl0, scal, seeds0,
                            tags, valid, conv_j, *, engine, R, M, n_sub,
                            dt_eff, bidi, use_local_m, record_fft,
                            ckpt_dir, chunk_frames, resume,
                            stop_after_chunks, interpret, noise,
                            smooth_radius=0, mesh=None):
    """Chunked fused-kernel run (the ckpt_dir= mode of
    :func:`run_exclusion_sweep`): the frame scan executes in
    ``chunk_frames``-frame ranges — per-frame seeds ``seeds0 + f`` make a
    range-split scan reproduce the unsplit draws exactly — with an atomic
    checkpoint of each chunk's records/raw tracer sites plus the packed
    slot-field carry.  Returns ``(sl, stacked, raws)`` (host) or ``None``
    when ``stop_after_chunks`` halted an incomplete run."""
    from pathlib import Path

    from hydrolim_tpu.sweeps.persistence import config_hash
    from hydrolim_tpu.utils.checkpoint import (
        _atomic_savez,
        _chunk_path,
        _digest,
        _pipelined_chunks,
        _resume_prefix,
    )

    L, K = config.L, config.K
    cfg = {f: repr(getattr(config, f))
           for f in config.__dataclass_fields__ if f != "flip_rate_fn"}
    run_hash = config_hash({
        "fused_config": cfg, "engine": engine, "R": R, "M": M,
        "n_sub": n_sub, "dt_eff": dt_eff, "record_fft": record_fft,
        "smooth_radius": smooth_radius,
        "interpret": bool(interpret),
        "sl0": _digest(sl0), "scal": _digest(scal),
        "seeds0": _digest(seeds0), "tags": _digest(tags),
        "valid": _digest(valid), "conv": _digest(conv_j),
        "noise": _digest(noise)})
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    chunk_frames, n_chunks, done = _resume_prefix(
        ckpt_dir, run_hash, what="fused exclusion run", resume=resume,
        chunk_size=chunk_frames, n_units=M,
        size_key="chunk_frames", unit_key="n_frames")

    mesh_ax = None if mesh is None else mesh.axis_names[0]

    def _scan(sl, scal, seeds0, tags, valid, conv_j, xs):
        # global program ids per shard — same contract as run_scanned in
        # :func:`run_exclusion_sweep` (sharded chunks bit-match unsharded)
        G_local = sl.shape[0] // R
        pid0 = (jax.lax.axis_index(mesh_ax) * G_local
                if mesh_ax is not None else 0)
        prog_ids = pid0 + jnp.arange(G_local, dtype=jnp.int32)

        def frame_body(sl, x):
            f, nz = x if noise is not None else (x, None)
            sl = kernel_fn(
                scal, seeds0 + f, sl, conv_j, L=L, K=K, k_steps=n_sub,
                dt=dt_eff, periodic=config.periodic, bidirectional=bidi,
                use_local_m=use_local_m, smooth_radius=smooth_radius,
                r_batch=R, prog_ids=prog_ids,
                interpret=interpret, noise=nz)
            return sl, sl
        sl, sl_frames = jax.lax.scan(frame_body, sl, xs)
        frames, raws = jax.lax.map(lambda s: rec(s, tags, valid), sl_frames)
        return sl, frames, raws

    if mesh is not None:
        ranged = _shard_mapped_runner(_scan, mesh, rec, sl0, tags, valid,
                                      has_noise=noise is not None)
    else:
        ranged = jax.jit(_scan)

    # generic tree persistence: leaves keyed by index, structure re-derived
    # from an eval_shape template (the record pytree class stays private)
    frame_tpl, raw_tpl = jax.eval_shape(
        rec, jax.ShapeDtypeStruct(sl0.shape, sl0.dtype),
        jax.ShapeDtypeStruct(tags.shape, tags.dtype),
        jax.ShapeDtypeStruct(valid.shape, valid.dtype))
    payload_struct = jax.tree.structure((frame_tpl, raw_tpl))
    n_payload = payload_struct.num_leaves

    def save_fused(path, payload, sl_):
        leaves = jax.tree.leaves((payload, sl_))
        assert len(leaves) == n_payload + 1
        _atomic_savez(path, **{f"leaf_{i:03d}": np.asarray(x)
                               for i, x in enumerate(leaves)})

    def load_fused(path):
        with np.load(path) as z:
            leaves = [z[k] for k in sorted(z.files)]
        assert len(leaves) == n_payload + 1
        frames_, raws_ = jax.tree.unflatten(payload_struct,
                                            leaves[:n_payload])
        return (frames_, raws_), jnp.asarray(leaves[-1])

    if done > 0:
        _, sl = load_fused(_chunk_path(ckpt_dir, done - 1))
    else:
        sl = sl0

    def run_chunk(sl, lo, hi):
        segs = []
        if lo == 0:
            f0, r0 = rec(sl, tags, valid)           # sl == sl0 at lo == 0
            segs.append((jax.tree.map(lambda a: a[None], f0), r0[None]))
        lo1 = max(lo, 1)
        if hi > lo1:
            idx = jnp.arange(lo1, hi, dtype=jnp.int32)
            xs = (idx, jnp.asarray(noise[lo1 - 1:hi - 1])) \
                if noise is not None else idx
            # under mesh=, ranged is jit(shard_map(...)) whose in_specs
            # re-place the (possibly host-restored) carry on the mesh
            sl, fr, rw = ranged(sl, scal, seeds0, tags, valid, conv_j, xs)
            segs.append((fr, rw))
        if len(segs) == 2:
            fr = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                              segs[0][0], segs[1][0])
            rw = jnp.concatenate([segs[0][1], segs[1][1]], axis=0)
        else:
            fr, rw = segs[0]
        return (fr, rw), sl

    sl = _pipelined_chunks(ckpt_dir, sl, done=done, n_chunks=n_chunks,
                           chunk_size=chunk_frames, n_units=M,
                           run_chunk=run_chunk, save_chunk=save_fused,
                           stop_after_chunks=stop_after_chunks)
    if sl is None:
        return None

    frs, rws = [], []
    for c in range(n_chunks):
        (fr, rw), sl = load_fused(_chunk_path(ckpt_dir, c))
        frs.append(fr)
        rws.append(rw)
    stacked = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *frs)
    raws = np.concatenate(rws, axis=0)
    return np.asarray(sl), stacked, raws


def run_exclusion_sweep(config: ParticleConfig, params_b: ParticleParams,
                        key: jnp.ndarray, *, T: float, obs_dt: float,
                        dt: float, engine: str = "auto", rho0_plus=None,
                        rho0_minus=None, record_fft: bool = True,
                        n_tracers: int = 0, mesh=None,
                        b_real: Optional[int] = None,
                        r_batch: Optional[int] = None,
                        ckpt_dir=None, chunk_frames: int = 64,
                        resume: bool = True,
                        stop_after_chunks: Optional[int] = None,
                        _interpret: bool = False, _noise=None
                        ) -> Tuple[LatticeGasFrames, np.ndarray]:
    """Fused-kernel exclusion sweep over the batch of ``params_b``.

    Same return contract as ``run_lattice_gas_k``: batched
    ``LatticeGasFrames`` (leaves (B, M, …), tracer_pos unwrapped with
    ``TRACER_INVALID`` sentinels) plus the final (B, K, L) slot spin
    fields.

    ``mesh=`` (a 1-D sweep mesh, parallel.mesh.sweep_mesh) runs the fused
    kernel under ``jax.shard_map`` with the replica batch split across the
    mesh axis — B must be a multiple of the mesh size (the sweep drivers
    pad; pure DP, zero cross-shard communication, per-replica results
    identical to the unsharded kernel).  On the XLA fallback the mesh is
    honored by the caller sharding ``params_b`` (GSPMD propagation).

    ``b_real=`` is the TRUE replica count when the caller already padded
    ``params_b`` to a mesh multiple: the replica-row batch R must derive
    from a mesh-INVARIANT size, or a padded call would pick a different R
    than the unsharded call and every PRNG draw shape would change
    (breaking the bit-identity contract).  Defaults to the params batch.

    ``r_batch=`` overrides the VMEM-heuristic replica-row batch (ADVICE
    r3): trajectories at a fixed seed depend on R (replicas in a program
    share draw blocks), so pass the R recorded in ``last_run_info`` /
    the sweep npz to reproduce a run across heuristic changes.

    ``engine='pallas_rb'`` routes through the replica-banked kernel
    (ops/pallas_exclusion_rb.py, (K, R, Lp) layout — 100% sublane
    occupancy); same contract, different PRNG draw shapes, so
    trajectories at a fixed seed differ from ``'pallas'``/``'xla'``.

    ``ckpt_dir=`` makes the run preemption-safe: the frame scan executes
    in ``chunk_frames``-frame chunks with an atomic checkpoint of each
    chunk's records plus the slot-field carry.  Per-frame PRNG seeds are
    ``seeds0 + frame`` — a pure function of the global frame index — so a
    range-split scan reproduces the unsplit scan's draws exactly: the
    trajectory (slot states, tracer sites, counts) is **bit-identical**;
    float records whose reductions are lowered per record-block shape
    (fft_amp and m_local via (·, L)·(L, L) matmuls, var via the lattice
    variance) are computed in per-chunk record blocks and agree to ~1 ulp
    (XLA reassociation at different block shapes — the same caveat as
    resharding, docs/ROADMAP.md).  Composes with ``mesh=`` (the chunked
    scan runs under the same shard_map and the restored carry is re-placed
    by the program's in_specs; resume must use the same mesh SIZE — the
    padded batch depends on it); the XLA fallback routes to
    ``run_lattice_gas_k_checkpointed`` (which IS bit-identical throughout —
    its records are computed per frame inside the scan).  Returns ``None``
    when ``stop_after_chunks`` halted an incomplete run.

    ``_interpret``/``_noise`` are the CPU validation hooks (kernel under
    ``interpret=True`` consuming an (M-1, G, k_steps, 2, R, Kp, Lp) block
    of pre-drawn bits as scan xs) — production TPU runs use neither."""
    from hydrolim_tpu.particles.lattice_gas_k import lgk_init, run_lattice_gas_k

    assert is_pallas_exclusion_path(config), (
        "run_exclusion_sweep requires the fused-kernel configuration class "
        "(K<=8 exclusion, no anchors/crowding, default flip rate)")

    if engine == "auto":
        # batched exclusion routes to the replica-banked kernel: with the
        # round-5 narrow smoothing it beats both the plain fused kernel
        # and the XLA slot engine at B >= 8 (5.1 vs 17.0 vs 7.5 us/step at
        # the B=16 flagship — docs/ROADMAP.md round-5 adjudication); the
        # plain (R, Kp, Lp) kernel keeps single/small-replica latency
        # (R=1 rb would idle 7/8 sublanes where plain fills Kp of 8)
        B_route = params_b.beta.shape[0] if b_real is None else b_real
        fused = "pallas_rb" if B_route >= 8 else "pallas"
        if mesh is not None:
            # the kernel must run where the mesh lives (Mosaic has no CPU
            # interpreter): a CPU/virtual mesh routes to the XLA engine
            engine = (fused if all(d.platform == "tpu"
                                   for d in mesh.devices.flat) else "xla")
        else:
            engine = fused if default_device_is_tpu() else "xla"
    if engine in ("pallas", "pallas_rb") and not default_device_is_tpu() \
            and mesh is None and not _interpret:
        # explicit pallas off-TPU cannot run (no Mosaic interpreter on the
        # production path) — keep the documented automatic XLA fallback
        engine = "xla"

    last_run_info.clear()
    last_run_info["engine"] = engine
    if engine == "xla":
        if ckpt_dir is not None:
            from hydrolim_tpu.utils.checkpoint import (
                run_lattice_gas_k_checkpointed,
            )

            out = run_lattice_gas_k_checkpointed(
                config, params_b, key, T=T, obs_dt=obs_dt, dt=dt,
                ckpt_dir=ckpt_dir, chunk_frames=chunk_frames,
                rho0_plus=rho0_plus, rho0_minus=rho0_minus,
                record_fft=record_fft, n_tracers=n_tracers, resume=resume,
                stop_after_chunks=stop_after_chunks, mesh=mesh)
            if out is None:
                return None
            frames, slots = out
            return frames, np.asarray(slots)
        frames, slots = run_lattice_gas_k(
            config, params_b, key, T=T, obs_dt=obs_dt, dt=dt,
            rho0_plus=rho0_plus, rho0_minus=rho0_minus,
            record_fft=record_fft, n_tracers=n_tracers)
        return jax.device_get(frames), np.asarray(slots)

    if engine == "pallas_rb":
        from hydrolim_tpu.ops.pallas_exclusion_rb import (
            exclusion_multi_step_rb as kernel_fn,
            pack_slots_rb as pack_fn,
        )
    else:
        from hydrolim_tpu.ops.pallas_exclusion import (
            exclusion_multi_step as kernel_fn,
            pack_slots as pack_fn,
        )
    from hydrolim_tpu.ops.pallas_exclusion import (
        build_conv_matrix,
        unpack_slots,
    )

    B = params_b.beta.shape[0]
    K, L = config.K, config.L
    times = np.arange(0.0, T, obs_dt)
    M = len(times)
    n_sub = substeps_for(obs_dt, dt)
    dt_eff = obs_dt / n_sub

    if config.periodic and n_tracers > 0:
        # unwrap_tracer_sites resolves periodic winding by per-frame
        # minimal image, valid only while per-frame |displacement| < L/2.
        # Bound the expected per-frame event count (drift + both diffusion
        # directions); exceeding L/2 net displacement then has a
        # negligible Poisson tail.  Fail loudly rather than silently
        # folding every displacement to the wrong branch.
        ev = float(np.max(np.asarray(params_b.rate_active))
                   + 2.0 * np.max(np.asarray(params_b.rate_diffusion)))
        if ev * obs_dt >= L / 2:
            raise ValueError(
                f"obs_dt={obs_dt} gives ~{ev * obs_dt:.0f} expected events "
                f"per frame >= L/2={L // 2}: per-frame minimal-image "
                "unwrapping of tracer winding would be ambiguous — use a "
                "smaller obs_dt or engine='xla' (exact per-substep "
                "winding)")

    key, k_seed, k_tag = jax.random.split(key, 3)
    keys = jax.random.split(key, B)
    init_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    if rho0_plus is not None and np.ndim(rho0_plus) == 2:
        spins0 = jax.vmap(lambda k, rp, rm: lgk_init(config, k, rp, rm))(
            init_keys, jnp.asarray(rho0_plus), jnp.asarray(rho0_minus))
    else:
        spins0 = jax.vmap(lambda k: lgk_init(config, k, rho0_plus,
                                             rho0_minus))(init_keys)
    spins0 = np.asarray(spins0)

    # payloads: sign = spin, magnitude = flat slot index + 1 at t=0
    flat_ids = (np.arange(K * L, dtype=np.int32) + 1).reshape(K, L)
    slots0 = spins0 * flat_ids[None]
    if n_tracers > 0:
        tags, valid = _init_tags(slots0, k_tag, min(n_tracers, K * L))
    else:
        tags = jnp.zeros((B, 0), jnp.int32)
        valid = jnp.zeros((B, 0), bool)

    scal = np.zeros((B, 3), np.float32)
    scal[:, 0] = np.asarray(params_b.beta)
    scal[:, 1] = np.asarray(params_b.rate_diffusion)
    scal[:, 2] = np.asarray(params_b.rate_active)
    scal = jnp.asarray(scal)
    seeds0 = jax.random.randint(k_seed, (B,), 0, 2 ** 31 - 1 - M,
                                dtype=jnp.int32)

    use_local_m = config.local_kernel_sigma > 0
    # narrow σ (the flagship class) smooths via rolled taps + an exact
    # corner matmul instead of the dense (Lp, Lp) MXU product — the round-5
    # adjudication found the dense matmul dominating the fused kernels'
    # step time (docs/ROADMAP.md)
    from hydrolim_tpu.ops.pallas_exclusion import (
        build_narrow_smooth,
        narrow_smooth_radius,
    )

    smooth_radius = narrow_smooth_radius(config) if use_local_m else 0
    if smooth_radius > 0:
        conv = build_narrow_smooth(config, smooth_radius)
    else:
        conv = build_conv_matrix(config) if use_local_m else np.zeros((0, 0))
    bidi = config.active_model == "bidirectional"
    rec = _record_fn(config, record_fft)

    sl0 = pack_fn(slots0)
    conv_j = jnp.asarray(conv, jnp.float32)
    # replica-row batch per kernel program, chosen from the GLOBAL batch so
    # the grid layout (and hence every program's PRNG stream) is identical
    # for every mesh size; each shard then runs G_local = Bp/(n_sw*R)
    # programs whose GLOBAL ids are threaded into the kernel's second seed
    # word (prog_ids below), making the sharded run bit-identical to the
    # unsharded one replica-for-replica
    n_sw = 1 if mesh is None else int(mesh.shape[mesh.axis_names[0]])
    assert B % n_sw == 0, (
        f"fused-kernel batch {B} must be a multiple of the sweep mesh "
        f"size {n_sw} (the sweep drivers pad; see parallel.mesh)")
    if r_batch is not None and int(r_batch) < 1:
        raise ValueError(f"r_batch must be >= 1, got {r_batch}")
    if r_batch is not None:
        R = int(r_batch)
    elif engine == "pallas_rb":
        R = _pick_r_batch_rb(B if b_real is None else b_real, config)
    else:
        R = _pick_r_batch(config, B if b_real is None else b_real)
    last_run_info.update(r_batch=R, b_real=B if b_real is None else b_real)
    Bp = -(-B // (R * n_sw)) * (R * n_sw)
    if Bp != B:
        # pad replicas so R divides every shard's local batch; pad rows
        # replicate the last replica and are dropped on return
        from hydrolim_tpu.parallel.mesh import pad_batch

        sl0, scal, seeds0, tags, valid = pad_batch(
            (sl0, scal, seeds0, tags, valid), Bp, B=B)

    # ONE compiled program for the whole run: the frame loop is a lax.scan
    # over the fused kernel ONLY (per-frame slot states as scan ys), with
    # the frame-observable computation applied afterwards in CHUNKS of
    # frames.  Three hard-won constraints shape this:
    # - a host-side frame loop (kernel dispatch + per-frame device_get)
    #   costs a synchronous tunnel round-trip per frame on the remote axon
    #   backend — measured 8x SLOWER than the XLA slot engine at the
    #   reference beta-sweep scale despite the faster kernel;
    # - the record computation INSIDE the kernel scan body ballooned XLA
    #   compile to ~19 min at that scale; as a post-pass it compiles fast
    #   and stays in the same single-dispatch program;
    # - a flat vmap over ALL frames materializes every per-frame record
    #   intermediate (site_of/ids are (B, K·L) int32 each) simultaneously —
    #   ~GBs for long-T runs — so the post-pass is a lax.map over
    #   _REC_CHUNK-frame blocks: intermediates bounded per block, the
    #   (M, B, Kp, Lp) slot-frame ys remain the only O(M) buffer.
    mesh_ax = None if mesh is None else mesh.axis_names[0]

    def run_scanned(sl0, scal, seeds0, tags, valid, conv_j, xs):
        # GLOBAL program ids for this shard's programs: replicas group into
        # consecutive R-rows from global row 0, so shard i's local program
        # g is global program i*G_local + g — passed as the kernel's second
        # PRNG seed word so per-replica streams match the unsharded run.
        # ``xs`` is the scan input: the frame-index vector, or (idx, noise)
        # with injected noise — an ARGUMENT (not a closure capture) so the
        # noise's program axis shards with the replicas under shard_map.
        G_local = sl0.shape[0] // R
        pid0 = (jax.lax.axis_index(mesh_ax) * G_local
                if mesh_ax is not None else 0)
        prog_ids = pid0 + jnp.arange(G_local, dtype=jnp.int32)

        def frame_body(sl, x):
            f, nz = x if _noise is not None else (x, None)
            sl = kernel_fn(
                scal, seeds0 + f, sl, conv_j, L=L, K=K, k_steps=n_sub,
                dt=dt_eff, periodic=config.periodic, bidirectional=bidi,
                use_local_m=use_local_m, smooth_radius=smooth_radius,
                r_batch=R, prog_ids=prog_ids,
                interpret=_interpret, noise=nz)
            return sl, sl

        sl, sl_frames = jax.lax.scan(frame_body, sl0, xs)

        CH = min(_REC_CHUNK, M)
        pad = (-M) % CH
        all_sl = jnp.concatenate(
            [sl0[None], sl_frames] +
            ([jnp.zeros((pad,) + sl0.shape, sl0.dtype)] if pad else []),
            axis=0)                                     # (M + pad, B, …)
        blocks = all_sl.reshape((M + pad) // CH, CH, *sl0.shape)
        frames, raws = jax.lax.map(
            lambda blk: jax.vmap(lambda s: rec(s, tags, valid))(blk), blocks)
        unblock = lambda x: x.reshape((M + pad,) + x.shape[2:])[:M]
        return sl, jax.tree.map(unblock, frames), unblock(raws)

    if ckpt_dir is not None:
        # chunked fused route: seeds0 + f makes every frame's draws a pure
        # function of the global frame index, so chunks stitch bit-identical.
        # Composes with mesh= (VERDICT r4 #2): chunks persist host-side and
        # the carry is re-placed on the mesh per chunk; resume requires the
        # same mesh SIZE (the padded batch Bp depends on it).
        out = _run_fused_checkpointed(
            config, kernel_fn, rec, sl0, scal, seeds0, tags, valid, conv_j,
            engine=engine, R=R, M=M, n_sub=n_sub, dt_eff=dt_eff, bidi=bidi,
            use_local_m=use_local_m, record_fft=record_fft,
            ckpt_dir=ckpt_dir, chunk_frames=chunk_frames, resume=resume,
            stop_after_chunks=stop_after_chunks, interpret=_interpret,
            noise=_noise, smooth_radius=smooth_radius, mesh=mesh)
        if out is None:
            return None
        sl, stacked, raws = out
    elif mesh is not None:
        # replica-axis shard_map: each shard runs the UNCHANGED fused kernel
        # program on its local batch rows — pure DP, no collectives, so the
        # wrapped kernel is bit-identical to the unwrapped one per replica
        runner = _shard_mapped_runner(run_scanned, mesh, rec, sl0, tags,
                                      valid, has_noise=_noise is not None)
    else:
        runner = jax.jit(run_scanned)

    if ckpt_dir is None:
        idx = jnp.arange(1, M, dtype=jnp.int32)
        xs = (idx, jnp.asarray(_noise)) if _noise is not None else idx
        sl, stacked, raws = jax.device_get(
            runner(sl0, scal, seeds0, tags, valid, conv_j, xs))
    tracer_pos = unwrap_tracer_sites(raws, L, config.periodic)
    cut = lambda a: np.moveaxis(a, 0, 1)[:B]     # frame-major → (B, M, …)
    frames = LatticeGasFrames(
        rho_p=cut(stacked.rho_p),
        rho_m=cut(stacked.rho_m),
        total=cut(stacked.total),
        m_local=cut(stacked.m_local),
        m_global=cut(stacked.m_global),
        var=cut(stacked.var),
        fft_amp=cut(stacked.fft_amp),
        tracer_pos=cut(tracer_pos))
    spins_final = np.sign(unpack_slots(sl[:B], K, L)).astype(np.int32)
    return frames, spins_final
