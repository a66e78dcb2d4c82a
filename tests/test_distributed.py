"""Multi-device validation on the virtual 8-CPU mesh:

  * coefficient-sharded four-step NTT == single-device result, bit-exact
  * dp x tp sharded full pipeline == unsharded pipeline
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matrix_fhe_tpu.config import get_params
from matrix_fhe_tpu.models.he import HEContext
from matrix_fhe_tpu.ops.ntt_large import (FourStepNTT, FourStepPlan,
                                          generate_primes_1mod)
from matrix_fhe_tpu.parallel import mesh as meshlib
from matrix_fhe_tpu.parallel.dist_ntt import DistFourStepNTT
from matrix_fhe_tpu.parallel.pipeline import ShardedPipeline


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dist_ntt_matches_single_device(rng):
    primes = generate_primes_1mod(2, 35, 1 << 11)
    plan = FourStepPlan.make(1024, primes, negacyclic=True)
    mesh = meshlib.make_mesh({"coeff": 8})
    dist = DistFourStepNTT(plan, mesh)
    single = FourStepNTT(plan)
    x = np.stack([rng.integers(0, q, size=(2, 1024), dtype=np.uint64)
                  for q in primes])
    xj = jnp.asarray(x)
    f_dist = np.asarray(dist.forward(xj))
    f_single = np.asarray(single.forward(xj))
    assert (f_dist == f_single).all()
    back = np.asarray(dist.inverse(jnp.asarray(f_dist)))
    assert (back == x).all()


def test_sharded_pipeline_matches_unsharded():
    p = get_params("tiny")  # W = 8 lanes -> tp=4 shards of 2
    ctx = HEContext(p)
    sk = ctx.generate_secret_key()
    mesh = meshlib.make_mesh({"dp": 2, "tp": 4})
    sp = ShardedPipeline(ctx, mesh)
    rng = np.random.default_rng(21)
    B = 4
    re = rng.uniform(-2, 2, size=(B, p.phi, p.n, p.n))
    im = rng.uniform(-2, 2, size=(B, p.phi, p.n, p.n))
    dr, di = sp.roundtrip(jnp.asarray(re), jnp.asarray(im), sk)
    # unsharded single-message reference
    dr0, di0 = ctx.roundtrip(jnp.asarray(re[0]), jnp.asarray(im[0]), sk)
    np.testing.assert_allclose(np.asarray(dr)[0], np.asarray(dr0),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(di)[0], np.asarray(di0),
                               rtol=0, atol=1e-9)
    err = np.hypot(np.asarray(dr) - re, np.asarray(di) - im).max()
    assert err < 0.5


def test_mesh_factoring():
    assert meshlib.factor_mesh(8) == {"dp": 2, "tp": 4}
    assert meshlib.factor_mesh(1) == {"dp": 1, "tp": 1}
    assert meshlib.factor_mesh(7) == {"dp": 1, "tp": 7}


def test_dist_ntt_pallas_stages_bit_exact(rng):
    """The Pallas shard-local stage variant == the XLA-composed dist path."""
    primes = generate_primes_1mod(2, 35, 1 << 11)
    plan = FourStepPlan.make(1024, primes)
    mesh = meshlib.make_mesh({"coeff": 8})
    d_xla = DistFourStepNTT(plan, mesh, axis="coeff", use_pallas=False)
    d_pal = DistFourStepNTT(plan, mesh, axis="coeff", use_pallas=True)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, size=(2, plan.n), dtype=np.uint64)
         for q in primes]))
    fx = np.asarray(d_xla.forward(x))
    fp = np.asarray(d_pal.forward(x))
    assert (fx == fp).all()
    back = np.asarray(d_pal.inverse(d_pal.forward(x)))
    assert (back == np.asarray(x)).all()


def test_keyswitch_sharded_matches_unsharded(rng):
    """Relinearized multiply under a W-sharded mesh == replicated result,
    bit-exact (GSPMD places the W-contraction collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from matrix_fhe_tpu.models.he import Ciphertext
    from matrix_fhe_tpu.models.keyswitch import RelinContext
    from matrix_fhe_tpu.models import rng as refrng

    p = get_params("tiny")
    ctx = HEContext(p, ring="nega")
    rc = RelinContext(ctx)
    sk = ctx.generate_secret_key()
    rlk = rc.gen_relin_key(
        jnp.asarray(refrng.ternary_secret(p)), jax.random.key(5))
    c = rng.integers(0, 1 << 16, size=(p.phi, p.n, p.n))
    coeffs = jnp.asarray(np.stack(
        [(c % int(q)).astype(np.uint64) for q in p.moduli]))
    ct1 = ctx.encrypt(ctx.wt.forward(coeffs), sk)
    ct2 = ctx.encrypt(ctx.wt.forward(coeffs), sk)

    want = rc.multiply_relinearize(ct1, ct2, rlk)

    mesh = meshlib.make_mesh({"tp": 8})
    s_ct = NamedSharding(mesh, P(None, "tp", None, None))   # shard W lanes
    rep = NamedSharding(mesh, P())
    f = jax.jit(rc._multiply_relinearize_fn,
                in_shardings=(Ciphertext(s_ct, s_ct),
                              Ciphertext(s_ct, s_ct),
                              jax.tree.map(lambda _: rep, rlk)),
                out_shardings=Ciphertext(s_ct, s_ct))
    got = f(ct1, ct2, rlk)
    np.testing.assert_array_equal(np.asarray(want.b), np.asarray(got.b))
    np.testing.assert_array_equal(np.asarray(want.a), np.asarray(got.a))


def test_cost_model_inputs():
    """bench_dist cost_model: exact byte accounting + the DCN-bound finding.

    The coeff-sharded four-step NTT moves the whole polynomial once over
    the all_to_all while per-chip compute shrinks as 1/d — the model must
    report it comm-bound across hosts (docs/PERF.md round 4)."""
    import bench_dist as bd

    class Plan:
        n = 1 << 17
        n1 = 512
        n2 = 256

    m = bd.cost_model_inputs(Plan, 8, measured_ntt16_rate=109.6e3)
    per = m["per_poly_limb"]
    # each device holds N/d coeffs at 8 B and sends the (d-1)/d remote share
    assert per["a2a_bytes_per_device"] == 8 * (1 << 17) // 8 * 7 // 8
    # one-way cross-DCN bytes per host = half of the host's half of the data
    assert per["dcn_bytes_oneway"] == 8 * (1 << 17) // 4
    assert m["comm_bound"] is True
    assert m["anchor_is_measured"] is True
    assert 0 < m["projected_efficiency_no_overlap"] < 0.85
    # anchor fallback is flagged
    m2 = bd.cost_model_inputs(Plan, 8)
    assert m2["anchor_is_measured"] is False
    # sensitivity curve is monotone in DCN bandwidth and the analytic
    # 85% crossover is consistent with it (VERDICT r4 Next #7)
    sens = m["dcn_sensitivity"]
    effs = [r["eff_pipelined"] for r in sens]
    assert effs == sorted(effs) and len(sens) >= 5
    xo = m["dcn_crossover_gbps_85pct_pipelined"]
    if xo is not None:
        for r in sens:
            if r["dcn_gbps"] >= xo * 1.05:
                assert r["eff_pipelined"] >= 0.85
            elif r["dcn_gbps"] <= xo * 0.95:
                assert r["eff_pipelined"] <= 0.86


def test_recorded_ntt16_rate_reads_bench_records():
    import bench_dist as bd
    r = bd.recorded_ntt16_rate()
    # BENCH_r02.json carries 109329.9; r03 is the zero-value outage record
    assert r is None or r > 0
