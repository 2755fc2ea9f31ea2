"""Spatial self-attention op.

One implementation covers the capabilities of both reference attention blocks
(naive einsum ``unet.py:55-81`` and xformers memory-efficient ``unet.py:84-103``).

Two paths:
  * ``_xla_attention`` — fused scaled-dot-product in f32 softmax; XLA fuses the
    softmax chain into the two MXU matmuls. At the reference's token counts
    (≤ 32×32 = 1024 spatial tokens) the full score matrix fits comfortably in
    VMEM, so this is already near speed-of-light.
  * ``flash_attention`` — Pallas blockwise-softmax (flash) kernel for larger
    token counts / long-tail memory wins; used when shapes are tile-aligned.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """q, k, v: (B, T, N, C) → (B, T, N*C). Softmax in f32 (parity with the
    reference's f32 softmax, unet.py:59-60)."""
    B, T, N, C = q.shape
    scale = 1.0 / math.sqrt(C)
    logits = jnp.einsum("btnc,bsnc->bnts", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnts,bsnc->btnc", weights, v)
    return out.reshape(B, T, N * C)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    """Blockwise-softmax attention over one (q-block, head) tile.

    Refs arrive as (block_q, C) / (T, C) slices in VMEM; the online-softmax
    running max/denominator stay in registers across k-blocks.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    T = k_ref.shape[1]
    block_q, C = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, C), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, T // block_k, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_block(T: int, preferred: int) -> int:
    """Largest block ≤ preferred that divides T. Callers guarantee T % 128 == 0,
    so this always lands on a sublane-aligned size (128 or 256)."""
    b = min(preferred, T)
    while T % b:
        b -= 128
    return b


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int = 256, block_k: int = 256
) -> jax.Array:
    """Pallas flash attention. q, k, v: (B, T, N, C) → (B, T, N*C).

    Requires T % 128 ≡ 0 and C % 128 ≡ 0 (MXU lane alignment); callers fall
    back to the XLA path otherwise. Block sizes are shrunk to divide T so
    non-multiple-of-256 token counts (e.g. T=384) are covered exactly.
    """
    B, T, N, C = q.shape
    block_q = _pick_block(T, block_q)
    block_k = _pick_block(T, block_k)
    scale = 1.0 / math.sqrt(C)

    # (B, T, N, C) -> (B*N, T, C): heads become batch for the kernel grid
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(B * N, T, C)
    qf, kf, vf = fold(q), fold(k), fold(v)

    grid = (B * N, T // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * N, T, C), q.dtype),
    )(qf, kf, vf)
    # (B*N, T, C) -> (B, T, N*C)
    return out.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)


def flash_attention_qkv(
    qkv: jax.Array, num_heads: int, block_q: int = 256, block_k: int = 256
) -> jax.Array:
    """Flash attention on the fused projection output.

    qkv: (B, T, 3·N·C) laid out [q_heads | k_heads | v_heads] (the reference's
    single 1x1-conv layout, unet.py:70-78). q/k/v arrive in the kernel as three
    lane-offset BlockSpec views of the SAME array — blocks of C columns at
    offsets n·C / (N+n)·C / (2N+n)·C — so there are no split or head-transpose
    copies (profiling showed those copies costing ~3% of the sampling step).
    Requires C % 128 == 0 (lane-aligned offsets). Returns (B, T, N·C).
    """
    B, T, threeNC = qkv.shape
    N = num_heads
    C = threeNC // (3 * N)
    scale = 1.0 / math.sqrt(C)

    bq = _QBLK_INFER
    if T > _QBLK_THRESHOLD and T % bq == 0 and bq * T * 4 + 9 * T * C * 4 <= 12 * 1024 * 1024:
        # large T: the direct-softmax q-blocked kernel beats the online-softmax
        # flash form by ~14% (T=1024: 46.7 vs 40.3 TF/s chained,
        # scripts/bench_flash_t1024.py) — no running-max rescale passes
        return pl.pallas_call(
            functools.partial(_attn_fwd_kernel_qblk, scale=scale),
            grid=(B, N, T // bq),
            in_specs=[
                pl.BlockSpec((1, bq, C), lambda b, n, i: (b, i, n), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, C), lambda b, n, i: (b, 0, N + n), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, C), lambda b, n, i: (b, 0, 2 * N + n), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, C), lambda b, n, i: (b, i, n), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, N * C), qkv.dtype),
        )(qkv, qkv, qkv)

    block_q = _pick_block(T, block_q)
    block_k = _pick_block(T, block_k)

    grid = (B, N, T // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, C), lambda b, n, i: (b, i, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, n, i: (b, 0, N + n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, n, i: (b, 0, 2 * N + n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, C), lambda b, n, i: (b, i, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, N * C), qkv.dtype),
    )(qkv, qkv, qkv)
    return out


# ---------------------------------------------------------------------------
# differentiable flash attention (training path)
# ---------------------------------------------------------------------------
#
# Profiled on v5e (scripts/profile_train_attention.py): attention is 20.4% of
# the flagship train step (24.7 ms of 121 ms), most of it the f32 (T, T)
# softmax chain XLA materializes in HBM forward AND backward. At the UNet's
# token counts (T <= 1024) a whole (T, T) tile fits VMEM, so both passes run
# un-blocked per (batch*head) program and recompute the softmax in the
# backward from q/k (cheaper than saving it; standard flash-bwd identity
# ds = P * (dp - rowsum(P*dp))).


def _bmm(a, b, ca: int, cb: int):
    """Head-batched matmul: contract axis ``ca`` of a with ``cb`` of b,
    batching axis 0."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale  # (G, T, C)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = _bmm(q, k, 2, 2)  # (G, Tq, Tk)
    if v.shape[-1] < s.shape[-1]:
        # unnormalized-softmax matmul; divide the (G, Tq, C) OUTPUT by the
        # row sums — Tk/C× fewer divides than normalizing the score tile
        # (see ``_attn_fwd_kernel_pack1``; chip-measured there). Static
        # shape gate: at C ≥ Tk (e.g. CIFAR's T=64/C=256 tile) normalizing
        # the score tile is the cheaper side.
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0] = (_bmm(e, v, 2, 1) / l).astype(o_ref.dtype)
    else:
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0] = _bmm(p, v, 2, 1).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    """Whole-(T,T) backward. Matmul operands stay in the INPUT dtype (same
    native-MXU-mode treatment as ``_attn_bwd_kernel_qblk`` — f32 accumulation
    via ``preferred_element_type``; softmax/ds algebra f32; p/ds rounded to
    the input dtype only as matmul operands, below the bf16 output rounding).
    f32 inputs are unchanged (the casts become no-ops)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = _bmm(q, k, 2, 2) * scale
    p = jax.nn.softmax(s, axis=-1)  # f32 (G, Tq, Tk)
    dp = _bmm(do, v, 2, 2)  # (G, Tq, Tk)
    ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(q.dtype)
    pn = p.astype(q.dtype)
    dq_ref[0] = (_bmm(ds, k, 2, 1) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (_bmm(ds, q, 1, 1) * scale).astype(dk_ref.dtype)
    dv_ref[0] = _bmm(pn, do, 1, 1).astype(dv_ref.dtype)


def _attn_fwd_kernel_qblk(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """q-blocked forward for large T: q block (Bq, C) vs full-K/V (T, C).
    The whole (Bq, T) score row fits VMEM, so the softmax is direct (no
    online running max)."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    # output-divide softmax (see ``_attn_fwd_kernel_pack1``): T/C× fewer
    # divides than normalizing the (Bq, T) probability tile
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = (jnp.dot(e, v, preferred_element_type=jnp.float32) / l).astype(o_ref.dtype)


def _attn_bwd_kernel_qblk(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                          *, scale: float):
    """q-blocked backward: dq per q-block; dk/dv accumulate in their (f32)
    output block, which stays VMEM-resident across the q-block grid steps of
    one (batch*head).

    Matmul operands stay in the INPUT dtype: bf16 inputs feed the MXU in its
    fast native mode with f32 accumulation via ``preferred_element_type``
    (measured +7.8% at celeba's T=4096/C=64 up-resample attention,
    scripts/bench_attn_bwd_r4.py, vs casting everything to f32 on entry); for
    f32 inputs the ``astype`` calls are no-ops, so that path is unchanged.
    Softmax and the ds algebra stay f32 — only the p/ds MATMUL OPERANDS are
    rounded to the input dtype, which for bf16 sits below the bf16 output
    rounding of dq/dk/dv (measured max|d| = 0 after output rounding)."""
    qb = pl.program_id(1)

    @pl.when(qb == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]    # (bq, C), input dtype
    k = k_ref[0]    # (T, C)
    v = v_ref[0]    # (T, C)
    do = do_ref[0]  # (bq, C)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)  # f32 (bq, T)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(q.dtype)
    pn = p.astype(q.dtype)
    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
    dv_ref[0] += jax.lax.dot_general(pn, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


_QBLK_THRESHOLD = 512  # above this, whole-(T,T) tiles stop fitting VMEM
_QBLK_INFER = 512  # inference q-block (fwd holds 1 (bq,T) tile)


def _pick_qblk(T: int, C: int) -> int:
    """Largest training q-block whose backward working set (k/v f32 casts +
    f32 dk/dv accumulators + 3 (bq, T) score tiles) fits VMEM; 0 = none.

    Sub-lane C uses a tighter budget: the model undercounts there (Mosaic
    keeps extra (bq, T) temporaries) — measured on chip at celeba's
    T=4096/C=64 up-resample attention, where bq=128 allocates 17.11 MB
    against the 16 MB scoped-vmem limit while bq=64 compiles and runs.
    Lane-aligned budgets keep the chip-proven picks (T=1024/C=256 → 512,
    padded T=4096/C=128 → 64) unchanged."""
    budget = (8 if C < 128 else 12) * 1024 * 1024
    for bq in (512, 256, 128, 64, 32):
        if T % bq:
            continue
        vmem = 4 * T * C * 4 + 3 * bq * T * 4 + 3 * bq * C * 4
        if vmem <= budget:
            return bq
    return 0


def _pick_qblk_fwd(T: int, C: int) -> int:
    """Largest INFERENCE q-block (the fwd working set is just one (bq, T)
    score tile + the k/v casts — no dk/dv accumulators, so the budget is
    looser than training ``_pick_qblk``); 0 = none fits and the caller must
    take the memory-safe padded online-flash fallback. bq=512 at celeba's
    T=4096/C=64 up-resample attention is chip-proven — exactly on the 12 MB
    budget (scripts/celeba_probe_r3b.py). The fixed candidate floor guarantees
    termination — a bq-independent k/v term over budget (huge T·C) returns 0
    instead of looping to a ZeroDivisionError."""
    for bq in (512, 256, 128):
        if T % bq == 0 and bq * T * 4 + 4 * T * C * 4 <= 12 * 1024 * 1024:
            return bq
    return 0


def _attn_fwd_kernel_pack1(q_ref, k_ref, v_ref, o_ref, *, scale: float, C: int):
    """Packed sub-lane attention, ONE head per program. H = 128//C sub-lane
    heads sit PACKED side by side in each 128-wide lane block, taken straight
    out of the fused (B, T, 3·N·C) qkv at 128-aligned column offsets — a
    legal BlockSpec where per-head C=64 offsets are not (Mosaic: the last
    block dim must be ≡0 mod 128 or span it) — so the HBM split/head-transpose
    copies of the folded layout never materialize. The head is the grid's
    INNERMOST dim, selected by ``pl.when`` over static lane slices: only one
    head's (bq, T) score tile is live per program (an earlier variant unrolled
    all H heads in one program, so all H tiles counted against VMEM at once,
    capping T=4096/C=64 at bq=128 / 53.4 TF/s), so the q-block can be as
    large as the folded kernel's proven pick — bq=512 at celeba's shapes
    measures 3.58 ms vs the all-heads variant's 3.87 at T=1024 and 14.19 vs
    15.45 at T=4096 (scripts/bench_attn_pack1_r5.py, B=32/N=6/C=64 bf16).

    Stores stay full-128-lane (Mosaic partial-lane stores avoided): head 0
    writes ``[out0 | 0...]``, later heads accumulate ``[... 0 | out_h | 0 ...]``
    into the revisited block (disjoint lanes, so the adds are exact)."""
    h = pl.program_id(3)
    H = 128 // C
    bq = q_ref.shape[1]

    for hh in range(H):

        @pl.when(h == hh)
        def _(hh=hh):
            sl = slice(hh * C, (hh + 1) * C)
            q = q_ref[0][:, sl].astype(jnp.float32) * scale
            k = k_ref[0][:, sl].astype(jnp.float32)
            v = v_ref[0][:, sl].astype(jnp.float32)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            # unnormalized-softmax matmul, then divide the (bq, C) OUTPUT by
            # the row sums — T/C× fewer divides than normalizing the (bq, T)
            # probability tile (the in-model lse-forward runs 10.9 ms at
            # T=4096 where the jax.nn.softmax form microbenched 14.15)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            out = jnp.dot(e, v, preferred_element_type=jnp.float32) / l
            z = lambda n: jnp.zeros((bq, n * C), jnp.float32)
            full = jnp.concatenate(
                [a for a in (z(hh), out, z(H - 1 - hh)) if a.shape[-1]], axis=-1)
            if hh == 0:
                o_ref[0] = full.astype(o_ref.dtype)
            else:
                o_ref[0] += full.astype(o_ref.dtype)


def _pick_qblk_pack1(T: int, C: int) -> int:
    """Largest q-block for the one-head-per-program packed forward; 0 = none.
    Working set: ONE (bq, T) f32 score tile + one head's f32 k/v slices +
    the bf16 (T, 128) k/v input blocks — there is no all-heads tile term
    (one head per program), so T=4096/C=64 reaches bq=512 (the folded
    kernel's chip-proven pick, scripts/trace_celeba_r4.py)."""
    for bq in (512, 256, 128):
        vmem = bq * T * 4 + 2 * T * C * 4 + 2 * T * 128 * 2 + 2 * bq * 128 * 4
        if T % bq == 0 and vmem <= 13 * 1024 * 1024:
            return bq
    return 0


def _pack1_fwd_call(qkv, num_heads: int, C: int, bq: int, interpret: bool = False):
    """One-head-per-program packed forward: (B, T, 3·N·C) → (B, T, N·C), zero
    fold/unfold copies. This is the active inference path for sub-lane heads
    (``spatial_attention_qkv`` gates on the tiling preconditions before
    routing here). q/k/v blocks are 128-aligned column windows of the SAME
    fused qkv array (passed three times); the head loop lives in the grid's
    innermost dim, whose index the block maps ignore — q/k/v/out blocks stay
    VMEM-resident across the H head programs."""
    B, T, _ = qkv.shape
    NC = num_heads * C
    assert NC % 128 == 0 and 128 % C == 0, (
        f"_pack1_fwd_call needs NC%128==0 and 128%C==0, got N={num_heads}, C={C}"
    )
    nblk = NC // 128
    H = 128 // C
    spec_kv = lambda off: pl.BlockSpec(
        (1, T, 128), lambda b, p, i, h, off=off: (b, 0, off + p), memory_space=pltpu.VMEM)
    spec_blk = pl.BlockSpec((1, bq, 128), lambda b, p, i, h: (b, i, p), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel_pack1, scale=1.0 / math.sqrt(C), C=C),
        grid=(B, nblk, T // bq, H),
        in_specs=[spec_blk, spec_kv(nblk), spec_kv(2 * nblk)],
        out_specs=spec_blk,
        out_shape=jax.ShapeDtypeStruct((B, T, NC), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv)


def _attn_fwd_kernel_pack1_lse(q_ref, k_ref, v_ref, o_ref, lse_ref,
                               *, scale: float, C: int):
    """``_attn_fwd_kernel_pack1`` + a second output carrying each row's
    logsumexp (of the scaled scores), broadcast across the head's C lanes so
    the store stays full-128-lane. The lse is the residual that lets the
    kv-blocked backward recompute p chunk-wise without full (bq, T) rows."""
    h = pl.program_id(3)
    H = 128 // C
    bq = q_ref.shape[1]

    for hh in range(H):

        @pl.when(h == hh)
        def _(hh=hh):
            sl = slice(hh * C, (hh + 1) * C)
            q = q_ref[0][:, sl].astype(jnp.float32) * scale
            k = k_ref[0][:, sl].astype(jnp.float32)
            v = v_ref[0][:, sl].astype(jnp.float32)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=-1, keepdims=True)
            out = jnp.dot(e, v, preferred_element_type=jnp.float32) / l
            lse = jnp.broadcast_to(m + jnp.log(l), (bq, C))
            z = lambda n: jnp.zeros((bq, n * C), jnp.float32)
            emb = lambda x: jnp.concatenate(
                [a for a in (z(hh), x, z(H - 1 - hh)) if a.shape[-1]], axis=-1)
            if hh == 0:
                o_ref[0] = emb(out).astype(o_ref.dtype)
                lse_ref[0] = emb(lse)
            else:
                o_ref[0] += emb(out).astype(o_ref.dtype)
                lse_ref[0] += emb(lse)


def _pack1_fwd_lse_call(qkv, num_heads: int, C: int, bq: int,
                        interpret: bool = False):
    """Packed forward that also returns the per-row logsumexp, packed like the
    output ((B, T, N·C) f32, each head's value broadcast over its C lanes).
    Residual-producing forward of ``pack1_attention_trainable_kv``."""
    B, T, _ = qkv.shape
    NC = num_heads * C
    assert NC % 128 == 0 and 128 % C == 0, (
        f"_pack1_fwd_lse_call needs NC%128==0 and 128%C==0, got N={num_heads}, C={C}"
    )
    nblk = NC // 128
    H = 128 // C
    spec_kv = lambda off: pl.BlockSpec(
        (1, T, 128), lambda b, p, i, h, off=off: (b, 0, off + p), memory_space=pltpu.VMEM)
    spec_blk = pl.BlockSpec((1, bq, 128), lambda b, p, i, h: (b, i, p), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel_pack1_lse, scale=1.0 / math.sqrt(C), C=C),
        grid=(B, nblk, T // bq, H),
        in_specs=[spec_blk, spec_kv(nblk), spec_kv(2 * nblk)],
        out_specs=[spec_blk, spec_blk],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, NC), qkv.dtype),
            jax.ShapeDtypeStruct((B, T, NC), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv)


def _attn_bwd_kernel_pack1(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                           *, scale: float, C: int):
    """One-head-per-program packed backward (see ``_attn_fwd_kernel_pack1``
    for the head-in-grid scheme). Only one head's (bq, T) score/ds temporaries
    are live per program, so shapes where an all-heads-per-program backward
    cannot fit VMEM still get a real packed backward (T=4096/C=64 → bq=64 —
    though chip measurement shows the folded path still wins there; the
    dispatch gate is ``_pick_qblk_pack1_bwd(T, C) >= _PACK1_BWD_MIN_BQ``).
    dk/dv accumulate in f32 blocks resident across the (q-block, head) inner
    grid dims; matmul operands stay in the input dtype
    (``_attn_bwd_kernel_qblk``'s measured native-MXU treatment)."""
    i = pl.program_id(2)
    h = pl.program_id(3)
    H = 128 // C
    bq = q_ref.shape[1]

    @pl.when((i == 0) & (h == 0))
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    for hh in range(H):

        @pl.when(h == hh)
        def _(hh=hh):
            sl = slice(hh * C, (hh + 1) * C)
            qh = q_ref[0][:, sl]    # (bq, C), input dtype
            kh = k_ref[0][:, sl]    # (T, C)
            vh = v_ref[0][:, sl]
            doh = do_ref[0][:, sl]  # (bq, C)
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(s, axis=-1)  # f32 (bq, T)
            dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(qh.dtype)
            pn = p.astype(qh.dtype)
            dqh = jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale
            dkh = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) * scale
            dvh = jax.lax.dot_general(pn, doh, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

            def embed(x):  # (rows, C) f32 → full-lane (rows, 128), zeros elsewhere
                z = lambda n: jnp.zeros((x.shape[0], n * C), jnp.float32)
                return jnp.concatenate(
                    [a for a in (z(hh), x, z(H - 1 - hh)) if a.shape[-1]], axis=-1)

            if hh == 0:
                dq_ref[0] = embed(dqh).astype(dq_ref.dtype)
            else:
                dq_ref[0] += embed(dqh).astype(dq_ref.dtype)
            dk_ref[0] += embed(dkh)
            dv_ref[0] += embed(dvh)


def _pick_qblk_pack1_bwd(T: int, C: int) -> int:
    """Largest q-block for the one-head-per-program packed backward; 0 = none.
    Working set: ~3 one-head (bq, T) f32 tiles (s/p/dp; ds is input-dtype) +
    f32 dk/dv accumulator blocks (T, 128) ×2 + the (T, 128) embed temporaries
    + bf16 k/v input blocks. T=1024/C=64 → 256; T=4096 → 64."""
    for bq in (256, 128, 64, 32):
        vmem = (3 * bq * T * 4 + 2 * T * 128 * 4 + 2 * T * 128 * 4
                + 2 * T * 128 * 2 + 3 * bq * 128 * 4)
        if T % bq == 0 and vmem <= 14 * 1024 * 1024:
            return bq
    return 0


def _pack1_bwd_call(qkv, g, num_heads: int, C: int, bq: int, interpret: bool = False):
    """One-head-per-program packed backward pallas_call: (qkv, g) →
    (dq, dk_f32, dv_f32), each (B, T, N·C) in the packed head layout."""
    B, T, _ = qkv.shape
    NC = num_heads * C
    assert NC % 128 == 0 and 128 % C == 0, (
        f"_pack1_bwd_call needs NC%128==0 and 128%C==0, got N={num_heads}, C={C}"
    )
    nblk = NC // 128
    H = 128 // C
    spec_kv = lambda off: pl.BlockSpec(
        (1, T, 128), lambda b, p, i, h, off=off: (b, 0, off + p), memory_space=pltpu.VMEM)
    spec_blk = pl.BlockSpec((1, bq, 128), lambda b, p, i, h: (b, i, p), memory_space=pltpu.VMEM)
    spec_acc = pl.BlockSpec((1, T, 128), lambda b, p, i, h: (b, 0, p), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel_pack1, scale=1.0 / math.sqrt(C), C=C),
        grid=(B, nblk, T // bq, H),
        in_specs=[spec_blk, spec_kv(nblk), spec_kv(2 * nblk), spec_blk],
        out_specs=[spec_blk, spec_acc, spec_acc],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, NC), qkv.dtype),
            jax.ShapeDtypeStruct((B, T, NC), jnp.float32),
            jax.ShapeDtypeStruct((B, T, NC), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv, g)


def _attn_bwd_kernel_pack1_kv(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                              dq_ref, dk_ref, dv_ref,
                              *, scale: float, C: int, bkv: int):
    """Flash-style kv-blocked packed backward, one head per program. The
    full-row packed backward (``_attn_bwd_kernel_pack1``) needs 3 (bq, T)
    f32 temporaries, capping T=4096/C=64 at bq=64 — chip-measured SLOWER
    than the folded path. Here p is recomputed CHUNK-wise from the
    forward-saved logsumexp (p = exp(s·scale − lse)) and ds uses the saved
    output (delta = Σ_C do·o replaces the full-row Σ_T p·dp), so temporaries
    are (bq, bkv) and bq reaches 256 at T=4096. A ``fori_loop`` over kv
    chunks keeps ONE set of tile buffers live (python-unrolled chunks would
    multiply them — the all-heads-kernel VMEM lesson); dk/dv accumulate into
    resident f32 (T, 128) blocks via full-lane dynamic-row read-modify-write
    (Mosaic partial-lane stores avoided, as everywhere in the pack family)."""
    i = pl.program_id(2)
    h = pl.program_id(3)
    H = 128 // C
    bq = q_ref.shape[1]
    T = k_ref.shape[1]

    @pl.when((i == 0) & (h == 0))
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    for hh in range(H):

        @pl.when(h == hh)
        def _(hh=hh):
            sl = slice(hh * C, (hh + 1) * C)
            qh = q_ref[0][:, sl]    # (bq, C), input dtype
            doh = do_ref[0][:, sl]
            delta = jnp.sum(do_ref[0][:, sl].astype(jnp.float32)
                            * o_ref[0][:, sl].astype(jnp.float32),
                            axis=-1, keepdims=True)      # (bq, 1) f32
            lse = lse_ref[0][:, sl][:, :1]               # (bq, 1) f32

            def embed(x):  # (rows, C) f32 → full-lane (rows, 128)
                z = lambda n: jnp.zeros((x.shape[0], n * C), jnp.float32)
                return jnp.concatenate(
                    [a for a in (z(hh), x, z(H - 1 - hh)) if a.shape[-1]], axis=-1)

            def chunk(j, dq_acc):
                rows = pl.ds(j * bkv, bkv)
                kj = k_ref[0, rows, sl]                  # (bkv, C), input dtype
                vj = v_ref[0, rows, sl]
                s = jax.lax.dot_general(qh, kj, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                p = jnp.exp(s - lse)                     # f32 (bq, bkv)
                dp = jax.lax.dot_general(doh, vj, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                ds = (p * (dp - delta)).astype(qh.dtype)
                pn = p.astype(qh.dtype)
                dkj = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32) * scale
                dvj = jax.lax.dot_general(pn, doh, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
                dk_ref[0, rows, :] += embed(dkj)
                dv_ref[0, rows, :] += embed(dvj)
                return dq_acc + jnp.dot(ds, kj,
                                        preferred_element_type=jnp.float32) * scale

            dq_acc = jax.lax.fori_loop(0, T // bkv, chunk,
                                       jnp.zeros((bq, C), jnp.float32))
            if hh == 0:
                dq_ref[0] = embed(dq_acc).astype(dq_ref.dtype)
            else:
                dq_ref[0] += embed(dq_acc).astype(dq_ref.dtype)


def _pick_qblk_pack1_kv(T: int, C: int):
    """(bq, bkv) for the kv-blocked packed backward; (0, 0) = none. Working
    set: 3 (bq, bkv) f32 tiles (s/p/dp; ds is input-dtype) + the (bkv, 128)
    embed temporaries + f32 dk/dv resident blocks (T, 128) ×2 + bf16 k/v
    input blocks + the q/do/o/lse/dq blocks. Only meaningful when bkv < T
    (otherwise the full-row kernel is strictly simpler). T=4096/C=64 →
    (256, 1024)."""
    for bq in (256, 128):
        for bkv in (1024, 512):
            if T % bq or T % bkv or bkv >= T:
                continue
            vmem = (3 * bq * bkv * 4 + 2 * bkv * 128 * 4 + 2 * T * 128 * 4
                    + 2 * T * 128 * 2 + 6 * bq * 128 * 4)
            if vmem <= 13 * 1024 * 1024:
                return bq, bkv
    return 0, 0


def _pack1_bwd_kv_call(qkv, out, lse, g, num_heads: int, C: int, bq: int,
                       bkv: int, interpret: bool = False):
    """kv-blocked packed backward pallas_call: (qkv, out, lse, g) →
    (dq, dk_f32, dv_f32), each (B, T, N·C) in the packed head layout."""
    B, T, _ = qkv.shape
    NC = num_heads * C
    assert NC % 128 == 0 and 128 % C == 0, (
        f"_pack1_bwd_kv_call needs NC%128==0 and 128%C==0, got N={num_heads}, C={C}"
    )
    nblk = NC // 128
    H = 128 // C
    spec_kv = lambda off: pl.BlockSpec(
        (1, T, 128), lambda b, p, i, h, off=off: (b, 0, off + p), memory_space=pltpu.VMEM)
    spec_blk = pl.BlockSpec((1, bq, 128), lambda b, p, i, h: (b, i, p), memory_space=pltpu.VMEM)
    spec_acc = pl.BlockSpec((1, T, 128), lambda b, p, i, h: (b, 0, p), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel_pack1_kv, scale=1.0 / math.sqrt(C),
                          C=C, bkv=bkv),
        grid=(B, nblk, T // bq, H),
        in_specs=[spec_blk, spec_kv(nblk), spec_kv(2 * nblk), spec_blk,
                  spec_blk, spec_blk],
        out_specs=[spec_blk, spec_acc, spec_acc],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, NC), qkv.dtype),
            jax.ShapeDtypeStruct((B, T, NC), jnp.float32),
            jax.ShapeDtypeStruct((B, T, NC), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv, out, lse, g)


# Minimum packed-backward q-block worth taking over the folded path. Chip
# measurement (scripts/bench_attn_pack1_r5.py, B=32/N=6/C=64 bf16, fwd+bwd):
# T=1024 picks bq=256 → 5.64 ms vs folded-dispatch 6.50 (1.15x win; bq=128
# forced: 6.32, still a win); T=4096 picks bq=64 → 64.85 ms vs 57.46
# (0.89x LOSS — the tiny q-block re-reads k/v too many times). The gate
# keeps bq≥128 shapes packed and leaves bq<128 shapes on the folded path.
_PACK1_BWD_MIN_BQ = 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pack1_attention_trainable(qkv, num_heads: int, C: int, interpret: bool = False):
    """Differentiable packed sub-lane attention straight off the fused qkv:
    (B, T, 3·N·C) → (B, T, N·C). Both directions are the one-head-per-program
    packed kernels — zero fold/unfold copies (the r4 celeba train trace
    billed those copies at 18.6% of the step); the only remaining copy is
    assembling d(qkv), cheaper than the folded path's split + 2×3
    head-transposes + concat. Callers gate on ``_pick_qblk_pack1`` > 0 and
    ``_pick_qblk_pack1_bwd`` >= ``_PACK1_BWD_MIN_BQ`` (chip-measured: smaller
    backward q-blocks lose to the folded path)."""
    return _pack1_train_fwd(qkv, num_heads, C, interpret)[0]


def _pack1_train_fwd(qkv, num_heads, C, interpret):
    bq = _pick_qblk_pack1(qkv.shape[1], C)
    return _pack1_fwd_call(qkv, num_heads, C, bq, interpret), qkv


def _pack1_train_bwd(num_heads, C, interpret, qkv, g):
    bq = _pick_qblk_pack1_bwd(qkv.shape[1], C)
    assert bq, "dispatch must gate pack1 training on a packed-backward q-block"
    dq, dk, dv = _pack1_bwd_call(qkv, g, num_heads, C, bq, interpret)
    return (jnp.concatenate([dq, dk.astype(qkv.dtype), dv.astype(qkv.dtype)],
                            axis=-1),)


pack1_attention_trainable.defvjp(_pack1_train_fwd, _pack1_train_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pack1_attention_trainable_kv(qkv, num_heads: int, C: int,
                                 interpret: bool = False):
    """Differentiable packed sub-lane attention for shapes whose FULL-ROW
    packed backward q-block is below ``_PACK1_BWD_MIN_BQ`` (celeba's T=4096
    up-resample attention → bq=64, chip-measured slower than the folded
    path). The forward additionally saves (out, lse) residuals so the
    kv-blocked backward (``_attn_bwd_kernel_pack1_kv``) recomputes p
    chunk-wise at bq=256 — zero fold/unfold copies in either direction.
    Callers gate on ``_pick_qblk_pack1`` > 0 and ``_pick_qblk_pack1_kv``[0]
    > 0."""
    return _pack1_kv_train_fwd(qkv, num_heads, C, interpret)[0]


def _pack1_kv_train_fwd(qkv, num_heads, C, interpret):
    bq = _pick_qblk_pack1(qkv.shape[1], C)
    out, lse = _pack1_fwd_lse_call(qkv, num_heads, C, bq, interpret)
    return out, (qkv, out, lse)


def _pack1_kv_train_bwd(num_heads, C, interpret, res, g):
    qkv, out, lse = res
    bq, bkv = _pick_qblk_pack1_kv(qkv.shape[1], C)
    assert bq, "dispatch must gate the kv path on _pick_qblk_pack1_kv"
    dq, dk, dv = _pack1_bwd_kv_call(qkv, out, lse, g, num_heads, C, bq, bkv,
                                    interpret)
    return (jnp.concatenate([dq, dk.astype(qkv.dtype), dv.astype(qkv.dtype)],
                            axis=-1),)


pack1_attention_trainable_kv.defvjp(_pack1_kv_train_fwd, _pack1_kv_train_bwd)


def _qblk_fwd_call(q, k, v, bq: int, interpret: bool = False):
    """The q-blocked direct-softmax forward pallas_call, shared by the
    training fwd (``_flash_trainable_fwd``) and the native sub-lane inference
    path (``spatial_attention_qkv``) so their block plumbing cannot drift."""
    BN, T, C = q.shape
    spec_q = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel_qblk, scale=1.0 / math.sqrt(C)),
        grid=(BN, T // bq),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((BN, T, C), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _heads_per_program(BN: int, T: int, C: int) -> int:
    """Largest divisor of BN whose working set (3 f32 (T,T) tiles + operand
    casts per head) stays within ~8 MB — per-program launch overhead dwarfs
    the tiny per-head compute otherwise."""
    per_head = 3 * T * T * 4 + 8 * T * C * 4
    g = max(1, (8 * 1024 * 1024) // per_head)
    while BN % g:
        g -= 1
    return g


def _gbh_spec(G, T, C):
    return pl.BlockSpec((1, G, T, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_trainable(q, k, v, interpret: bool = False):
    """Differentiable fused attention. q/k/v: (BN, T, C) head-folded; returns
    (BN, T, C). Whole-(T,T) tiles, G heads per program — callers gate on T."""
    return _flash_trainable_fwd(q, k, v, interpret)[0]


def _flash_trainable_fwd(q, k, v, interpret):
    BN, T, C = q.shape
    scale = 1.0 / math.sqrt(C)
    if T > _QBLK_THRESHOLD:
        # The forward has no dk/dv accumulators in its working set, so it can
        # take the looser INFERENCE q-block budget — at celeba's T=4096/C=64
        # bq=512 runs 76 TF/s where the training picker's bq=64 managed only
        # 53 (scripts/trace_celeba_r4.py). Falls back to the training picker
        # when the inference candidates (512/256/128) don't divide T or fit.
        bq = _pick_qblk_fwd(T, C) or _pick_qblk(T, C)
        if bq == 0:
            raise ValueError(
                f"flash_attention_trainable: no q-block fits VMEM for T={T}, C={C}; "
                "gate calls with _flash_train_ok or use the XLA path"
            )
        return _qblk_fwd_call(q, k, v, bq, interpret), (q, k, v)
    G = _heads_per_program(BN, T, C)
    fold = lambda a: a.reshape(BN // G, G, T, C)
    out = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale),
        grid=(BN // G,),
        in_specs=[_gbh_spec(G, T, C)] * 3,
        out_specs=_gbh_spec(G, T, C),
        out_shape=jax.ShapeDtypeStruct((BN // G, G, T, C), q.dtype),
        interpret=interpret,
    )(fold(q), fold(k), fold(v))
    return out.reshape(BN, T, C), (q, k, v)


def _flash_trainable_bwd(interpret, res, g):
    q, k, v = res
    BN, T, C = q.shape
    scale = 1.0 / math.sqrt(C)
    if T > _QBLK_THRESHOLD:
        bq = _pick_qblk(T, C)
        if bq == 0:
            raise ValueError(
                f"flash_attention_trainable backward: no q-block fits VMEM for T={T}, C={C}"
            )
        qspec = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
        kvspec = pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_attn_bwd_kernel_qblk, scale=scale),
            grid=(BN, T // bq),
            in_specs=[qspec, kvspec, kvspec, qspec],
            # dk/dv: f32 accumulators, same block for every q-block step
            out_specs=[qspec, kvspec, kvspec],
            out_shape=[
                jax.ShapeDtypeStruct((BN, T, C), q.dtype),
                jax.ShapeDtypeStruct((BN, T, C), jnp.float32),
                jax.ShapeDtypeStruct((BN, T, C), jnp.float32),
            ],
            interpret=interpret,
        )(q, k, v, g)
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)
    G = _heads_per_program(BN, T, C)
    fold = lambda a: a.reshape(BN // G, G, T, C)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(BN // G,),
        in_specs=[_gbh_spec(G, T, C)] * 4,
        out_specs=[_gbh_spec(G, T, C)] * 3,
        out_shape=[jax.ShapeDtypeStruct((BN // G, G, T, C), q.dtype)] * 3,
        interpret=interpret,
    )(fold(q), fold(k), fold(v), fold(g))
    unfold = lambda a: a.reshape(BN, T, C)
    return unfold(dq), unfold(dk), unfold(dv)


flash_attention_trainable.defvjp(_flash_trainable_fwd, _flash_trainable_bwd)


def _flash_train_ok(T: int, C: int) -> bool:
    """Small T: whole-(T,T) f32 tiles must fit VMEM alongside the operands.
    Large T: an adaptive q-block must exist (e.g. T=1024/C=256 → bq=512;
    celeba's native T=4096/C=64 up-resample attention → bq=64). Sub-lane
    power-of-two head dims
    (32/64) are legal unpadded — blocks span the full last dim — and measured
    faster than the zero-padded form (scripts/bench_attn_celeba_train_r3.py:
    6.94 vs 7.22 ms fwd+bwd at the celeba level-1 shape)."""
    if C % 128 and C not in (32, 64):
        return False
    if T > _QBLK_THRESHOLD:
        return _pick_qblk(T, C) > 0
    vmem = 3 * T * T * 4 + 8 * T * C * 4
    return T % 8 == 0 and vmem <= 8 * 1024 * 1024


def spatial_attention(q: jax.Array, k: jax.Array, v: jax.Array, use_flash: bool = True):
    """Dispatch: Pallas flash kernel when tile-aligned on TPU, else fused XLA."""
    B, T, N, C = q.shape
    on_tpu = jax.default_backend() == "tpu"
    if use_flash and on_tpu and T % 128 == 0 and C % 128 == 0:
        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)


def pack1_padded_heads(T: int, num_heads: int, C: int, train: bool) -> int:
    """Head count to zero-pad to so the packed (pack1) kernels take an
    otherwise misaligned sub-lane shape — celeba's T=256 attention level has
    N=9/C=64 → NC=576, not 128-aligned, so it pays fold/unfold copies on the
    folded paths (trace-billed 2.7 ms/step of the celeba sampler,
    RUNLOG_TPU.md r5f). Returns 0 when padding buys nothing: already aligned,
    not a sub-lane power-of-two head dim, not on TPU, or the dispatch would
    not route the padded shape to a packed kernel anyway (mirrors
    ``spatial_attention_qkv``'s pack1 gates so a padded call can never fall
    through to a folded path on a bigger tensor).

    The pad is applied by the CALLER at the projection-weight level (zero
    qkv-weight columns per q/k/v section, zero proj-out rows — see
    ``models/unet.py:AttentionBlock``), NOT by padding the activation (that
    would be a full-tensor copy, the thing being eliminated). The padded
    head's q/k/v are then exact zeros: its scores are 0, its softmax is
    uniform, its output rows are 0·v = 0, and every gradient reaching the
    real weights is exactly 0 (the pad head's dq/dk are p·(dp−δ)-shaped with
    dp = δ = 0; its dv is nonzero only against the zero proj-out rows, and
    d(w_pad)'s pad columns are discarded by the weight-concat VJP). Cost is
    num_padded/num_heads extra attention+projection FLOPs at that level
    (10/9 ≈ +11% for celeba's T=256 — on a level that is a few % of the
    step)."""
    if jax.default_backend() != "tpu" or C not in (32, 64) or T % 128:
        return 0
    NC = num_heads * C
    if NC % 128 == 0:  # already aligned — no pad needed
        return 0
    n_pad = num_heads + (-NC % 128) // C
    if not _pick_qblk_pack1(T, C):
        return 0
    if train and _pick_qblk_pack1_bwd(T, C) < _PACK1_BWD_MIN_BQ \
            and not _pick_qblk_pack1_kv(T, C)[0]:
        return 0
    return n_pad


def spatial_attention_qkv(
    qkv: jax.Array, num_heads: int, use_flash: bool = True, train: bool = False
):
    """Fused-qkv entry: (B, T, 3·N·C) → (B, T, N·C).

    Inference uses the lane-offset-view flash kernel (no split copies) when
    the head dim is lane-aligned; training uses the custom-VJP flash kernels
    (the f32 softmax chain is 20% of the train step through XLA autodiff).

    Sub-lane head dims (e.g. celeba's head_dim=64) run the kernels natively
    when legal (power-of-two 32/64 — a block may span the full sub-lane last
    dim) and are otherwise zero-padded to the 128-lane width with q pre-scaled
    by √(C_pad/C) so the kernels' 1/√C_pad nets to the true 1/√C. celeba's T
    reaches 64·64 = 4096: the reference's up-level resample block
    (unet.py:278,243) upsamples INSIDE the ResidualBlock and then attends, so
    `up_1_us` at the 64×64 config attends post-upsample — the XLA fallback
    would materialize (4096, 4096) logits there."""
    B, T, threeNC = qkv.shape
    N = num_heads
    C = threeNC // (3 * N)
    on_tpu = jax.default_backend() == "tpu"
    Cp = -(-C // 128) * 128  # lane-padded head dim

    if use_flash and on_tpu and not train and T % 128 == 0 and C == Cp:
        return flash_attention_qkv(qkv, N)

    def folded(pad: bool):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        fold = lambda a: a.reshape(B, T, N, C).transpose(0, 2, 1, 3).reshape(B * N, T, C)
        q, k, v = fold(q), fold(k), fold(v)
        if pad:
            widths = [(0, 0), (0, 0), (0, Cp - C)]
            q = jnp.pad(q * (Cp / C) ** 0.5, widths)  # pre-scale: see docstring
            k, v = jnp.pad(k, widths), jnp.pad(v, widths)
        return q, k, v

    def unfolded(out):
        return out[..., :C].reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)

    # training, sub-lane heads: PACKED custom-VJP path straight off the fused
    # qkv (same head-tiling preconditions as the inference packed gate) —
    # kills the fold/unfold copies around the VJP. Gated on a packed-backward
    # q-block of at least _PACK1_BWD_MIN_BQ: chip measurement
    # (scripts/bench_attn_pack1_r5.py) shows pack1 fwd+bwd 1.15x over the
    # prior dispatch at T=1024 (bq_bwd=256) but 0.89x at T=4096 (bq_bwd=64 —
    # the tiny q-block re-reads k/v too often), so small-bq shapes stay on
    # the folded path below.
    if (use_flash and on_tpu and train and T % 128 == 0 and C in (32, 64)
            and (N * C) % 128 == 0 and _pick_qblk_pack1(T, C)):
        if _pick_qblk_pack1_bwd(T, C) >= _PACK1_BWD_MIN_BQ:
            return pack1_attention_trainable(qkv, N, C)
        # full-row backward q-block too small (celeba's T=4096 → bq=64,
        # chip-measured 0.89x vs folded): the kv-blocked backward recomputes
        # p chunk-wise from lse/out residuals at bq=256 — chip-measured
        # 39.64 ms vs the folded path's 57.65 on the T=4096 fwd+bwd pair
        # (1.45x, 72.8 TF/s; scripts/bench_attn_pack1_r5.py)
        if _pick_qblk_pack1_kv(T, C)[0]:
            return pack1_attention_trainable_kv(qkv, N, C)
    # training: native width when legal (C lane-aligned OR sub-lane 32/64 —
    # blocks span the full last dim), zero-padded lane width otherwise
    Cn = C if _flash_train_ok(T, C) else Cp
    if use_flash and on_tpu and train and _flash_train_ok(T, Cn):
        return unfolded(flash_attention_trainable(*folded(pad=Cn != C)))
    if use_flash and on_tpu and not train and T % 128 == 0:
        # sub-lane heads at inference, preferred order:
        #   1. PACKED one-head-per-program kernel straight off the fused qkv
        #      (zero fold/unfold copies): legal when whole heads tile the
        #      128-lane blocks (NC % 128 == 0 and 128 % C == 0, i.e.
        #      C ∈ {32, 64}) and a q-block fits VMEM. Chip-measured at both
        #      celeba shapes (scripts/bench_attn_pack1_r5.py): 3.58 ms vs the
        #      r5 all-heads packed dispatch's 3.87 at T=1024 and 14.19 vs
        #      15.48 at T=4096 — the split + head-transpose copies the packed
        #      family kills were trace-billed ~13% of the celeba sampling
        #      step (RUNLOG_TPU.md r4).
        if C in (32, 64) and (N * C) % 128 == 0:
            bq = _pick_qblk_pack1(T, C)
            if bq:
                return _pack1_fwd_call(qkv, N, C, bq)
        #   2. NATIVE-width direct-softmax q-blocked kernel on the folded
        #      layout, no zero-padding. A block that spans the full (sub-lane)
        #      last dim is legal in Pallas for power-of-two widths (32/64 —
        #      same rule the training gate enforces), so q/k/v stay (BN, T, C)
        #      with C=64 — no padded value copies materialize. Measured at the
        #      celeba level-1 shape (B=32, T=1024, N=6, C=64;
        #      scripts/bench_attn_celeba_r3.py): 1.48x over the padded
        #      online-softmax path (2547 vs 3764 us).
        bq = _pick_qblk_fwd(T, C) if C in (32, 64) else 0
        if bq:
            q, k, v = folded(pad=False)
            out = _qblk_fwd_call(q, k, v, bq)
            return out.reshape(B, N, T, C).transpose(0, 2, 1, 3).reshape(B, T, N * C)
        # fallback: padded online flash (memory-safe at any T, any width)
        q, k, v = folded(pad=True)
        tok = lambda a: a.reshape(B * N, T, 1, Cp)
        return unfolded(flash_attention(tok(q), tok(k), tok(v)).reshape(B * N, T, Cp))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    tok = lambda a: a.reshape(B, T, num_heads, C)
    return _xla_attention(tok(q), tok(k), tok(v))
