"""bench.py accounting tests.

Regression gate for VERDICT r4 weak #1: XLA ``cost_analysis()`` counts a
``while``/``scan`` body ONCE, not × trip count, so BENCH_r04's mfu fields were
undercounted by exactly the scan length (×256 sampler / ×n_steps train).
``_compile_with_flops(..., scan_trips=K)`` corrects that; this test pins the
whole contract with a known-FLOPs matmul inside a length-K scan — it fails
both if the multiply is dropped AND if XLA starts counting trips itself (the
multiply would then double-count and must be removed).
"""

import jax
import jax.numpy as jnp


def test_compile_with_flops_counts_scan_trips():
    import bench

    K, m = 7, 128
    body_flops = 2 * m**3  # one (m,m)x(m,m) matmul

    @jax.jit
    def scan_mm(x):
        def body(c, _):
            return jnp.dot(c, c), None

        c, _ = jax.lax.scan(body, x, None, length=K)
        return c

    x = jnp.eye(m, dtype=jnp.float32)
    run, flops = bench._compile_with_flops(scan_mm, x, scan_trips=K)
    assert flops is not None, "cost_analysis must yield flops on this backend"
    # loose band: cost analysis may add small non-matmul ops, but a body-once
    # regression (flops ≈ body_flops) or a double-count (≈ K² × body) is far
    # outside it
    assert 0.9 * K * body_flops <= flops <= 1.5 * K * body_flops, (
        f"scan-trip FLOPs accounting broken: got {flops:.3g}, "
        f"expected ≈ {K * body_flops:.3g} (K={K} × body {body_flops:.3g})"
    )
    # the returned executable is the one the benches time — it must run
    out = run(x)
    assert out.shape == (m, m)


def test_util_fields_rate_math():
    """model_tf_per_sec = flops × execs/s / 1e12 / chips; mfu vs v5e peak."""
    import bench

    n = jax.device_count()
    fields = bench._util_fields(n * 1e12, 2.0, on_tpu=True)  # 2 TF/s/chip
    assert fields["model_tf_per_sec"] == 2.0
    assert fields["mfu"] == round(2.0 / bench.V5E_BF16_PEAK_TFS, 3)
    assert bench._util_fields(None, 2.0, on_tpu=True) == {}


def test_session_canary_smoke(capsys):
    """The canary line must emit valid JSON with a positive TF/s value (CPU
    smoke shapes; the chip-rate semantics are documented in the docstring)."""
    import json

    import bench

    bench.bench_session_canary(on_tpu=False)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "session_canary_matmul_tf_per_sec"
    assert rec["value"] > 0
