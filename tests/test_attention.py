"""Attention op tests: XLA path vs direct softmax, and the Pallas flash kernel
in TPU-interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdiff_tpu.ops.attention import _xla_attention, flash_attention


def _qkv(B=2, T=256, N=2, C=128, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, T, N, C).astype(np.float32) * 0.5)
    return mk(), mk(), mk()


def _direct(q, k, v):
    B, T, N, C = q.shape
    logits = np.einsum("btnc,bsnc->bnts", np.asarray(q), np.asarray(k)) / np.sqrt(C)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = np.einsum("bnts,bsnc->btnc", w, np.asarray(v))
    return out.reshape(B, T, N * C)


def test_xla_attention_matches_direct():
    q, k, v = _qkv(T=64, C=32)
    out = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), _direct(q, k, v), rtol=1e-4, atol=1e-5)


def test_flash_attention_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(T=256, C=128)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_flash_qkv_interpret_matches_xla():
    """Fused-qkv kernel (BlockSpec views, no splits) ≡ split + flash."""
    from jax.experimental.pallas import tpu as pltpu

    from vdiff_tpu.ops.attention import flash_attention_qkv

    B, T, N, C = 2, 256, 2, 128
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    tok = lambda a: a.reshape(B, T, N, C)
    ref = _xla_attention(tok(q), tok(k), tok(v))
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_qkv(qkv, N, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_flash_attention_head_folding():
    """Multi-head folding must keep heads independent and channel order n*C+c."""
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(B=1, T=128, N=2, C=128, seed=3)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), _direct(q, k, v), rtol=1e-4, atol=1e-4)


def test_flash_attention_nonmultiple_of_256_tokens():
    """T=384 (multiple of 128, not 256): default blocks must shrink to divide T
    — previously grid/fori_loop silently truncated to the first 256 tokens."""
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(B=1, T=384, N=1, C=128, seed=11)
    ref = _xla_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v)  # default 256 blocks -> picked 128
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_flash_qkv_nonmultiple_of_256_tokens():
    from jax.experimental.pallas import tpu as pltpu

    from vdiff_tpu.ops.attention import flash_attention_qkv

    B, T, N, C = 1, 384, 2, 128
    rng = np.random.RandomState(13)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    tok = lambda a: a.reshape(B, T, N, C)
    ref = _xla_attention(tok(q), tok(k), tok(v))
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_qkv(qkv, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("T,C", [(16, 8), (16, 32)])
def test_flash_trainable_forward_and_grads_match_xla(T, C):
    """Custom-VJP flash kernels (training path): value AND q/k/v grads vs
    autodiff through the XLA attention, interpret mode. (16, 8) takes the
    whole-tile forward's output-divide branch (C < T), (16, 32) the
    score-normalize branch (C ≥ T — CIFAR's T=64/C=256 tile class)."""
    import jax

    from vdiff_tpu.ops.attention import flash_attention_trainable

    BN = 3
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(BN, T, C).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(BN, T, C).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(BN, T, C).astype(np.float32) * 0.5)
    ct = jnp.asarray(rng.randn(BN, T, C).astype(np.float32))

    def ref_fn(q, k, v):
        # head dim of 1 folded in: (BN, T, 1, C)
        return _xla_attention(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])

    ref, ref_vjp = jax.vjp(ref_fn, q, k, v)
    got, got_vjp = jax.vjp(lambda q, k, v: flash_attention_trainable(q, k, v, True), q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    for g_got, g_ref in zip(got_vjp(ct), ref_vjp(ct)):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_spatial_attention_qkv_train_dispatch_matches_xla(monkeypatch):
    """The train=True fused path must equal the XLA path (values + grad wrt
    qkv), with the TPU gate monkeypatched open in interpret mode."""
    import jax

    from vdiff_tpu.ops import attention as A

    B, T, N, C = 2, 16, 2, 8
    rng = np.random.RandomState(9)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)

    def loss_ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, N, C)
        return jnp.sum(_xla_attention(tok(q), tok(k), tok(v)) ** 2)

    orig = A.flash_attention_trainable
    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(A, "_flash_train_ok", lambda T, C: True)
    monkeypatch.setattr(A, "flash_attention_trainable", lambda q, k, v: orig(q, k, v, True))

    def loss_flash(qkv):
        return jnp.sum(A.spatial_attention_qkv(qkv, N, use_flash=True, train=True) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(qkv)
    v_got, g_got = jax.value_and_grad(loss_flash)(qkv)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_flash_trainable_qblocked_matches_xla(monkeypatch):
    """Large-T path (q-blocked fwd/bwd with dk/dv accumulation across q-block
    grid steps): exercised at tiny sizes by lowering the threshold."""
    import jax

    from vdiff_tpu.ops import attention as A

    monkeypatch.setattr(A, "_QBLK_THRESHOLD", 8)
    monkeypatch.setattr(A, "_pick_qblk", lambda T, C: 8)

    BN, T, C = 2, 24, 8  # 3 q-blocks per (batch*head)
    rng = np.random.RandomState(21)
    q = jnp.asarray(rng.randn(BN, T, C).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(BN, T, C).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(BN, T, C).astype(np.float32) * 0.5)
    ct = jnp.asarray(rng.randn(BN, T, C).astype(np.float32))

    def ref_fn(q, k, v):
        return _xla_attention(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])

    ref, ref_vjp = jax.vjp(ref_fn, q, k, v)
    got, got_vjp = jax.vjp(lambda q, k, v: A.flash_attention_trainable(q, k, v, True), q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    for g_got, g_ref in zip(got_vjp(ct), ref_vjp(ct)):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_flash_qkv_large_t_direct_softmax_path(monkeypatch):
    """T above the q-block threshold routes to the direct-softmax kernel
    (lane-offset qkv views); exercised at small T by lowering the threshold
    and the 512-divisibility via a 512-token input in interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    from vdiff_tpu.ops import attention as A

    monkeypatch.setattr(A, "_QBLK_THRESHOLD", 256)
    B, T, N, C = 1, 512, 1, 128
    rng = np.random.RandomState(31)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    tok = lambda a: a.reshape(B, T, N, C)
    ref = _xla_attention(tok(q), tok(k), tok(v))
    with pltpu.force_tpu_interpret_mode():
        out = A.flash_attention_qkv(qkv, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pick_qblk_chip_proven_picks():
    """Pins the q-block choices proven on the v5e. Regression for the sub-lane
    VMEM undercount: at celeba's T=4096/C=64 up-resample attention (the
    reference upsamples inside the up-level ResidualBlock and THEN attends),
    bq=128 allocates 17.11 MB against the 16 MB scoped-vmem limit — Mosaic
    keeps extra (bq, T) temporaries beyond the analytical model for sub-lane
    last dims — while bq=64 compiles and runs."""
    from vdiff_tpu.ops.attention import _flash_train_ok, _pick_qblk

    assert _pick_qblk(4096, 64) == 64      # NOT 128: chip-measured scoped-vmem OOM
    assert _pick_qblk(1024, 256) == 512    # flagship T=1024 training kernel
    assert _pick_qblk(4096, 128) == 64     # padded celeba heads
    assert _flash_train_ok(4096, 64)       # native sub-lane celeba path stays on


def test_pick_qblk_fwd_picks_and_terminates():
    """Inference q-block picks proven on chip (scripts/celeba_probe_r3b.py),
    and the 0-means-fallback contract: when the bq-independent k/v VMEM term
    alone exceeds the budget (huge T·C) the picker returns 0 so the caller
    takes the padded online-flash fallback — regression for the former
    unbounded halving loop (bq→0 → ZeroDivisionError at exactly the large-T
    shapes the fallback exists for)."""
    from vdiff_tpu.ops.attention import _pick_qblk_fwd

    assert _pick_qblk_fwd(1024, 64) == 512   # celeba level-1 inference
    # up-resample attention (T=64·64): 8 MB q-tile + 4 MB k/v casts lands
    # exactly ON the 12 MB budget — chip-proven at bq=512
    assert _pick_qblk_fwd(4096, 64) == 512
    assert _pick_qblk_fwd(16384, 64) == 0    # k/v casts alone: 16.8 MB > 12 MB
    assert _pick_qblk_fwd(8192, 96) == 0


def test_spatial_attention_qkv_nonpow2_sublane_falls_back_padded(monkeypatch):
    """A non-power-of-two sub-lane head dim (e.g. 96) is illegal for native
    Pallas blocks (same rule _flash_train_ok enforces) — inference must take
    the zero-padded online-flash path, not build (·, ·, 96) BlockSpecs."""
    from jax.experimental.pallas import tpu as pltpu

    from vdiff_tpu.ops import attention as A

    B, T, N, C = 1, 128, 1, 96
    rng = np.random.RandomState(43)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    tok = lambda a: a.reshape(B, T, N, C)
    ref = _xla_attention(tok(q), tok(k), tok(v))

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    called = []
    orig = A._qblk_fwd_call
    monkeypatch.setattr(A, "_qblk_fwd_call",
                        lambda *a, **k2: called.append(1) or orig(*a, **k2))
    with pltpu.force_tpu_interpret_mode():
        out = A.spatial_attention_qkv(qkv, N, use_flash=True, train=False)
    assert not called, "non-pow2 sub-lane width must not take the native q-block path"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_spatial_attention_qkv_padded_heads_matches_xla(monkeypatch):
    """Sub-lane head dims (celeba head_dim=64 < 128 lanes) run the flash
    kernels on zero-padded heads with pre-scaled q — exact vs the XLA path,
    inference AND training grads, in interpret mode."""
    import functools

    import jax
    from jax.experimental.pallas import tpu as pltpu

    from vdiff_tpu.ops import attention as A

    B, T, N, C = 1, 128, 2, 32  # C below the "lane" width
    rng = np.random.RandomState(41)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)

    def ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, N, C)
        return _xla_attention(tok(q), tok(k), tok(v))

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    # pretend the pad target is the true lane width for this tiny shape
    monkeypatch.setattr(A, "_QBLK_THRESHOLD", 1 << 30)  # whole-tile trainable path
    orig_trainable = A.flash_attention_trainable
    monkeypatch.setattr(A, "flash_attention_trainable",
                        lambda q, k, v: orig_trainable(q, k, v, True))

    # training path (padded trainable kernels): values + grads
    def loss_flash(qkv):
        return jnp.sum(A.spatial_attention_qkv(qkv, N, use_flash=True, train=True) ** 2)

    def loss_ref(qkv):
        return jnp.sum(ref(qkv) ** 2)

    v_got, g_got = jax.value_and_grad(loss_flash)(qkv)
    v_ref, g_ref = jax.value_and_grad(loss_ref)(qkv)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-4)

    # inference path (padded online flash)
    with pltpu.force_tpu_interpret_mode():
        out = A.spatial_attention_qkv(qkv, N, use_flash=True, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(qkv)), rtol=1e-4, atol=1e-4)


def test_pack_fwd_rejects_untileable_heads():
    """The guards for the silent-truncation hazard: NC % 128 != 0 (e.g.
    celeba level-2's N=9, C=64 → NC=576) and non-dividing C must raise, not
    leave output columns uninitialized — both directions."""
    from vdiff_tpu.ops.attention import _pack1_bwd_call, _pack1_fwd_call

    qkv = jnp.zeros((1, 128, 3 * 9 * 64), jnp.float32)
    with pytest.raises(AssertionError):
        _pack1_fwd_call(qkv, 9, 64, 128, interpret=True)
    qkv96 = jnp.zeros((1, 128, 3 * 4 * 96), jnp.float32)
    with pytest.raises(AssertionError):
        _pack1_fwd_call(qkv96, 4, 96, 128, interpret=True)
    g = jnp.zeros((1, 128, 9 * 64), jnp.float32)
    with pytest.raises(AssertionError):
        _pack1_bwd_call(qkv, g, 9, 64, 128, interpret=True)


def test_spatial_attention_qkv_sublane_inference_routes_packed(monkeypatch):
    """Inference dispatch for sub-lane heads: celeba's (N=6, C=64) shape must
    take the PACKED zero-copy kernel; an NC % 128 != 0 shape (N=9, C=64,
    celeba level 2) must fall back to the folded q-block path. Values ≡ XLA
    both ways."""
    from jax.experimental.pallas import tpu as pltpu

    from vdiff_tpu.ops import attention as A

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    packed, folded = [], []
    orig_pack, orig_qblk = A._pack1_fwd_call, A._qblk_fwd_call
    monkeypatch.setattr(A, "_pack1_fwd_call",
                        lambda *a, **k: packed.append(1) or orig_pack(*a, **k))
    monkeypatch.setattr(A, "_qblk_fwd_call",
                        lambda *a, **k: folded.append(1) or orig_qblk(*a, **k))

    def ref(qkv, N, C):
        B, T = qkv.shape[0], qkv.shape[1]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, N, C)
        return _xla_attention(tok(q), tok(k), tok(v))

    rng = np.random.RandomState(17)
    B, T, C = 1, 128, 64

    qkv6 = jnp.asarray(rng.randn(B, T, 3 * 6 * C).astype(np.float32) * 0.5)
    with pltpu.force_tpu_interpret_mode():
        out6 = A.spatial_attention_qkv(qkv6, 6, use_flash=True, train=False)
    assert packed and not folded, "N=6/C=64 must route to the packed kernel"
    np.testing.assert_allclose(np.asarray(out6), np.asarray(ref(qkv6, 6, C)),
                               rtol=1e-4, atol=1e-4)

    packed.clear()
    qkv9 = jnp.asarray(rng.randn(B, T, 3 * 9 * C).astype(np.float32) * 0.5)
    with pltpu.force_tpu_interpret_mode():
        out9 = A.spatial_attention_qkv(qkv9, 9, use_flash=True, train=False)
    assert folded and not packed, "NC=576 must fall back to the folded q-block path"
    np.testing.assert_allclose(np.asarray(out9), np.asarray(ref(qkv9, 9, C)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("N,C", [(6, 64), (4, 32)])
def test_pack_trainable_matches_xla(N, C):
    """Packed custom-VJP path (training): value AND d(qkv) vs autodiff through
    the XLA attention — the packed backward kernel's per-head lane slices,
    dk/dv accumulation across q-block grid steps, and the d(qkv) assembly."""
    from vdiff_tpu.ops import attention as A

    B, T = 2, 256
    rng = np.random.RandomState(23)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)
    assert A._pick_qblk_pack1_bwd(T, C) >= A._PACK1_BWD_MIN_BQ  # in play

    def loss_ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, N, C)
        return jnp.sum(_xla_attention(tok(q), tok(k), tok(v)) ** 2)

    def loss_pack(qkv):
        return jnp.sum(A.pack1_attention_trainable(qkv, N, C, True) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(qkv)
    v_got, g_got = jax.value_and_grad(loss_pack)(qkv)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_spatial_attention_qkv_sublane_train_routes_packed(monkeypatch):
    """Training dispatch: celeba's sub-lane head shape (N=6, C=64) must take
    the packed custom-VJP path; values + grads ≡ XLA. An NC % 128 != 0 shape
    (N=9) must not, and neither must a shape whose packed-backward q-block
    falls below the chip-measured _PACK1_BWD_MIN_BQ gate (celeba's T=4096,
    where the folded path wins — simulated by forcing the picker small)."""
    from vdiff_tpu.ops import attention as A

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    routed = []
    orig = A.pack1_attention_trainable
    monkeypatch.setattr(A, "pack1_attention_trainable",
                        lambda qkv, n, c: routed.append(1) or orig(qkv, n, c, True))
    # keep the N=9 shape off the real (uninterpreted) folded kernels on CPU
    monkeypatch.setattr(A, "_flash_train_ok", lambda T, C: False)

    B, T, C = 1, 128, 64
    rng = np.random.RandomState(31)
    qkv6 = jnp.asarray(rng.randn(B, T, 3 * 6 * C).astype(np.float32) * 0.5)

    def ref6(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, 6, C)
        return jnp.sum(_xla_attention(tok(q), tok(k), tok(v)) ** 2)

    v_got, g_got = jax.value_and_grad(
        lambda q: jnp.sum(A.spatial_attention_qkv(q, 6, use_flash=True, train=True) ** 2)
    )(qkv6)
    assert routed, "N=6/C=64 training must route to pack1_attention_trainable"
    v_ref, g_ref = jax.value_and_grad(ref6)(qkv6)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-4)

    routed.clear()
    qkv9 = jnp.asarray(rng.randn(B, T, 3 * 9 * C).astype(np.float32) * 0.5)
    A.spatial_attention_qkv(qkv9, 9, use_flash=True, train=True)
    assert not routed, "NC=576 must not take the packed training path"

    # small-backward-q-block shapes (celeba's T=4096 → bq=64) take the
    # kv-blocked route when ITS picker fits, else fall back to folded
    routed_kv = []
    orig_kv = A.pack1_attention_trainable_kv
    monkeypatch.setattr(A, "pack1_attention_trainable_kv",
                        lambda qkv, n, c: routed_kv.append(1) or orig_kv(qkv, n, c, True))
    monkeypatch.setattr(A, "_pick_qblk_pack1_bwd",
                        lambda T, C: A._PACK1_BWD_MIN_BQ // 2)
    A.spatial_attention_qkv(qkv6, 6, use_flash=True, train=True)
    assert not routed and not routed_kv, (
        "bq_bwd < _PACK1_BWD_MIN_BQ with no kv pick must fall back to folded")

    monkeypatch.setattr(A, "_pick_qblk_pack1_kv", lambda T, C: (64, 64))
    v_kv, g_kv = jax.value_and_grad(
        lambda q: jnp.sum(A.spatial_attention_qkv(q, 6, use_flash=True, train=True) ** 2)
    )(qkv6)
    assert routed_kv and not routed, "kv pick present must route the kv path"
    np.testing.assert_allclose(float(v_kv), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_kv), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("N,C", [(2, 64), (6, 64), (8, 32)])
def test_pack1_fwd_matches_xla(N, C):
    """One-head-per-program packed forward (head in the grid's innermost dim,
    pl.when-selected static lane slices, full-width accumulating stores) ≡
    XLA attention. Covers nblk > 1 (N=6/C=64 → 3 blocks) and H=4 (C=32)."""
    from jax.experimental.pallas import tpu as pltpu

    from vdiff_tpu.ops.attention import _pack1_fwd_call, _pick_qblk_pack1

    B, T = 2, 256
    rng = np.random.RandomState(37)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    tok = lambda a: a.reshape(B, T, N, C)
    ref = _xla_attention(tok(q), tok(k), tok(v))
    bq = _pick_qblk_pack1(T, C)
    assert bq == 256
    with pltpu.force_tpu_interpret_mode():
        out = _pack1_fwd_call(qkv, N, C, bq, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("N,C", [(6, 64), (4, 32)])
def test_pack1_bwd_matches_autodiff(N, C):
    """One-head-per-program packed backward ≡ autodiff through XLA attention:
    per-head lane-slice reads, the [0 | dx_h | 0] full-width embed-accumulate
    stores (dq across heads; dk/dv across q-blocks AND heads), and the d(qkv)
    assembly, with a bq that gives multiple q-block grid steps."""
    from vdiff_tpu.ops import attention as A

    B, T, bq = 2, 256, 128
    rng = np.random.RandomState(41)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)

    def loss_ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, N, C)
        return jnp.sum(_xla_attention(tok(q), tok(k), tok(v)) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(qkv)

    out = A._pack1_fwd_call(qkv, N, C, bq, interpret=True)
    v_got = jnp.sum(out ** 2)
    g = 2.0 * out  # d(sum out²)/d(out)
    dq, dk, dv = A._pack1_bwd_call(qkv, g, N, C, bq, interpret=True)
    g_got = jnp.concatenate([dq, dk.astype(qkv.dtype), dv.astype(qkv.dtype)], axis=-1)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("N,C", [(6, 64), (4, 32)])
def test_pack1_kv_trainable_matches_xla(N, C, monkeypatch):
    """kv-blocked custom-VJP path (the T=4096 training route): value AND
    d(qkv) vs autodiff through XLA attention — the lse-saving forward, the
    chunk-wise p recompute (p = exp(s·scale − lse)), delta from the saved
    output, the fori_loop dq accumulation and the dynamic-row dk/dv
    read-modify-writes, with multiple kv chunks (bkv=128 < T=256) and
    multiple q blocks."""
    from vdiff_tpu.ops import attention as A

    B, T = 2, 256
    monkeypatch.setattr(A, "_pick_qblk_pack1_kv", lambda T, C: (128, 128))
    rng = np.random.RandomState(43)
    qkv = jnp.asarray(rng.randn(B, T, 3 * N * C).astype(np.float32) * 0.5)

    def loss_ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tok = lambda a: a.reshape(B, T, N, C)
        return jnp.sum(_xla_attention(tok(q), tok(k), tok(v)) ** 2)

    def loss_kv(qkv):
        return jnp.sum(A.pack1_attention_trainable_kv(qkv, N, C, True) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)(qkv)
    v_got, g_got = jax.value_and_grad(loss_kv)(qkv)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_pack1_pickers():
    """Pin the chip-validated picks at celeba's two attention shapes: the
    forward reaches the folded kernel's proven bq=512 at both (one head per
    program — no all-heads tile term in the working set), the backward gets
    bq=256 at T=1024 (above the _PACK1_BWD_MIN_BQ dispatch gate → packed
    training) and bq=64 at T=4096 (below it → folded training, the
    chip-measured winner there; scripts/bench_attn_pack1_r5.py)."""
    from vdiff_tpu.ops import attention as A

    assert A._pick_qblk_pack1(1024, 64) == 512
    assert A._pick_qblk_pack1(4096, 64) == 512
    assert A._pick_qblk_pack1_bwd(1024, 64) == 256 >= A._PACK1_BWD_MIN_BQ
    assert 0 < A._pick_qblk_pack1_bwd(4096, 64) == 64 < A._PACK1_BWD_MIN_BQ
    assert A._pick_qblk_pack1_kv(4096, 64) == (256, 1024)  # the T=4096 route

def test_pack1_padded_heads_gates(monkeypatch):
    """Gating of the weight-level head-padding helper: misaligned sub-lane
    shapes (celeba T=256: N=9/C=64 → NC=576) pad to the next 128-aligned head
    count; aligned, lane-aligned, non-tiling-T and CPU shapes return 0; the
    train gate mirrors the packed-backward dispatch gates so a padded call
    can never fall through to a folded path on a bigger tensor."""
    from vdiff_tpu.ops import attention as A

    assert A.pack1_padded_heads(256, 9, 64, train=False) == 0  # cpu backend

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    assert A.pack1_padded_heads(256, 9, 64, train=False) == 10
    assert A.pack1_padded_heads(256, 9, 64, train=True) == 10
    assert A.pack1_padded_heads(256, 5, 32, train=False) == 8   # NC=160 → 256
    assert A.pack1_padded_heads(256, 6, 64, train=False) == 0   # aligned
    assert A.pack1_padded_heads(256, 9, 128, train=False) == 0  # lane-aligned
    assert A.pack1_padded_heads(100, 9, 64, train=False) == 0   # T % 128
    # train gate: no packed backward of either flavor → no pad
    monkeypatch.setattr(A, "_pick_qblk_pack1_bwd", lambda T, C: 0)
    monkeypatch.setattr(A, "_pick_qblk_pack1_kv", lambda T, C: (0, 0))
    assert A.pack1_padded_heads(256, 9, 64, train=True) == 0
    assert A.pack1_padded_heads(256, 9, 64, train=False) == 10  # fwd unaffected


def _attention_block_setup(train):
    """Shared fixture for the padded-heads AttentionBlock tests: celeba's
    misaligned T=256 level (in_dim=576, head_dim=64 → N=9), params + input."""
    from vdiff_tpu.models.unet import AttentionBlock

    B, H, W, D = 1, 16, 16, 576
    rng = np.random.RandomState(41)
    x = jnp.asarray(rng.randn(B, H, W, D).astype(np.float32) * 0.3)
    block = AttentionBlock(head_dim=64, use_flash=True)
    params = block.init({"params": jax.random.key(0)}, x, train=train)["params"]
    # the zero-init proj_out would make the block's attention contribution
    # vanish (residual-only output — vacuous test); perturb it
    params = jax.tree.map(
        lambda p: p + 0.02 * np.random.RandomState(43).randn(*p.shape).astype(p.dtype),
        params)
    return block, params, x


def test_attention_block_padded_heads_matches_xla(monkeypatch):
    """End-to-end AttentionBlock at celeba's misaligned T=256/N=9/C=64 shape:
    the padded-weight pack1 route (interpret mode) must match the plain XLA
    block bit-for-bit up to kernel rounding — pad head contributes exactly
    zero through the zero proj-out rows."""
    from jax.experimental.pallas import tpu as pltpu

    from vdiff_tpu.ops import attention as A

    block, params, x = _attention_block_setup(train=False)
    ref = block.apply({"params": params}, x, train=False)  # cpu: unpadded XLA

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    routed = []
    orig = A._pack1_fwd_call
    monkeypatch.setattr(A, "_pack1_fwd_call",
                        lambda *a, **k: routed.append(a[1]) or orig(*a, **k))
    with pltpu.force_tpu_interpret_mode():
        got = block.apply({"params": params}, x, train=False)
    assert routed == [10], "padded inference must route pack1 with N_eff=10"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_attention_block_padded_heads_train_grads(monkeypatch):
    """Training through the padded-weight pack1 path: loss AND parameter
    gradients (incl. the padded qkv/proj-out weights, whose pad-column grads
    the weight-concat VJP must slice away) match XLA autodiff."""
    from vdiff_tpu.ops import attention as A

    block, params, x = _attention_block_setup(train=True)

    def loss(p):
        return jnp.sum(block.apply({"params": p}, x, train=True) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss)(params)

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    routed = []
    orig = A.pack1_attention_trainable
    monkeypatch.setattr(A, "pack1_attention_trainable",
                        lambda qkv, n, c: routed.append(n) or orig(qkv, n, c, True))
    v_got, g_got = jax.value_and_grad(loss)(params)
    assert routed == [10], "padded training must route pack1 with N_eff=10"
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for path, a, b in zip(jax.tree_util.tree_leaves_with_path(g_got)[0:],
                          jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=str(path[0]))
