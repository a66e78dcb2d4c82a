#!/usr/bin/env python
"""Multi-device scaling benchmark: NTT throughput and scaling efficiency.

Measures the two parallel decompositions of SURVEY §2's parallelism
inventory / BASELINE.json's multi-host config:

  * dp (limb/batch)-sharded NTT: embarrassingly parallel, zero-comm —
    the throughput-scaling configuration;
  * coefficient-sharded four-step NTT (DistFourStepNTT): one all_to_all
    stage exchange over ICI — the latency-scaling configuration for a
    single huge transform (N = 2^17).

With one real chip this falls back to the virtual
xla_force_host_platform_device_count CPU mesh: that VALIDATES the sharded
programs end-to-end (compile + execute + bit-exactness vs single-device)
but is not a hardware performance claim; the printed JSON is labeled
accordingly.  On a real pod slice the same script reports real scaling
efficiency (target: >= 85% on 2 hosts, BASELINE.md).

Validation knobs: BENCH_DIST_CPU=1 pins the CPU mesh without touching the
device backend (a dead axon tunnel can hang jax.default_backend() for
minutes); BENCH_DIST_QUICK=1 shrinks shapes for CPU-speed smoke runs.
"""

import glob
import json
import os
import subprocess
import sys
import time


def mp_worker(pid: int, nproc: int, port: int) -> None:
    """One process of the multi-process validation fleet: 4 virtual CPU
    devices per process, gloo collectives over the coordinator — the same
    jax.distributed program a real 2-host TPU fleet runs."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from matrix_fhe_tpu.parallel import multihost as mh
    active = mh.init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert active and jax.process_count() == nproc
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from matrix_fhe_tpu.ops.ntt_large import (FourStepNTT, FourStepPlan,
                                              generate_primes_1mod)
    from matrix_fhe_tpu.parallel.dist_ntt import DistFourStepNTT

    rng = np.random.default_rng(0)          # same stream on every process
    N, L, B = 1 << 12, 3, 4
    primes = generate_primes_1mod(L, 35, 2 * N)
    plan = FourStepPlan.make(N, primes)
    ntt = FourStepNTT(plan)
    x_np = np.stack([rng.integers(0, q, size=(B, N), dtype=np.uint64)
                     for q in primes])
    want = None

    # 1. dp over DCN: batch-sharded, zero-comm; each host checks its shards
    mesh = mh.hybrid_mesh({"dp": nproc}, {"coeff": 4})
    xg = mh.global_from_host_data(x_np, mesh, P(None, "dp", None))
    f = jax.jit(ntt.forward,
                out_shardings=NamedSharding(mesh, P(None, "dp", None)))
    yg = f(xg)
    want = np.asarray(jax.jit(ntt.forward)(jnp.asarray(x_np)))
    for idx, data in mh.local_shards(yg):
        assert (data == want[idx]).all(), "dp-sharded NTT shard mismatch"

    # 2. coeff axis spanning BOTH processes: the dist-NTT all_to_all crosses
    #    the process boundary (DCN path of the stage exchange)
    from jax.sharding import Mesh
    flat = Mesh(np.array(jax.devices()).reshape(4 * nproc), ("coeff",))
    dist = DistFourStepNTT(plan, flat, axis="coeff", use_pallas=False)
    x4 = x_np.reshape(L, B, plan.n1, plan.n2)
    xg2 = mh.global_from_host_data(x4, flat, P(None, None, None, "coeff"))
    zg = dist._fwd_sm(xg2, dist._twf_r, dist._twist_f_r)
    wantz = np.asarray(jax.jit(ntt.forward)(jnp.asarray(x_np))
                       ).reshape(L, B, plan.n1, plan.n2)
    for idx, data in mh.local_shards(zg):
        assert (data == wantz[idx]).all(), "cross-process dist NTT mismatch"

    # 3. roundtrip through the cross-process inverse
    xback = dist._inv_sm(zg, dist._twi_r, dist._twist_i_r)
    for idx, data in mh.local_shards(xback):
        assert (data == x4[idx]).all(), "cross-process inverse mismatch"

    print(f"[mp-worker {pid}] OK: dp-sharded + cross-process all_to_all "
          f"bit-exact on {jax.device_count()} global devices", flush=True)


def mp_parent(nproc: int) -> None:
    port = int(os.environ.get("MFHE_MP_PORT", "47911"))
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--mp-worker", str(i), "--mp-nproc", str(nproc),
         "--mp-port", str(port)],
        cwd=os.path.dirname(os.path.abspath(__file__)))
        for i in range(nproc)]
    codes = [p.wait() for p in procs]
    ok = all(c == 0 for c in codes)
    print(json.dumps({"mode": "multiprocess-cpu-validation",
                      "processes": nproc, "devices_per_process": 4,
                      "ok": ok, "exit_codes": codes}))
    sys.exit(0 if ok else 1)


def main():
    if "--multiprocess" in sys.argv:
        mp_parent(int(sys.argv[sys.argv.index("--multiprocess") + 1]))
        return
    if "--mp-worker" in sys.argv:
        mp_worker(int(sys.argv[sys.argv.index("--mp-worker") + 1]),
                  int(sys.argv[sys.argv.index("--mp-nproc") + 1]),
                  int(sys.argv[sys.argv.index("--mp-port") + 1]))
        return
    os.makedirs(".cache/xla", exist_ok=True)
    n_want = int(os.environ.get("BENCH_DIST_DEVICES", "8"))
    # the CPU fallback mesh needs this flag before the CPU client exists;
    # it is harmless for the TPU path
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_want}"
        ).strip()
    import jax
    if os.environ.get("BENCH_DIST_CPU") == "1":
        # validation mode: pin the CPU mesh BEFORE the first backend touch —
        # with the axon plugin loaded and the tunnel down,
        # jax.default_backend() itself can hang for minutes
        on_tpu = False
    else:
        try:
            on_tpu = (jax.default_backend() == "tpu"
                      and len(jax.devices()) >= 2)
        except RuntimeError as e:  # axon plugin loaded but tunnel down
            sys.stderr.write(f"[bench_dist] device backend failed ({e}); "
                             "falling back to the virtual CPU mesh\n")
            on_tpu = False
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        validation_only = True
    else:
        validation_only = False
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".cache/xla"))
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from matrix_fhe_tpu.ops.ntt_large import (FourStepNTT, FourStepPlan,
                                              generate_primes_1mod)
    from matrix_fhe_tpu.parallel.dist_ntt import DistFourStepNTT

    devs = (jax.devices("cpu") if validation_only else jax.devices())[:n_want]
    n_dev = len(devs)
    mode = "virtual-cpu-validation" if validation_only else "tpu"
    sys.stderr.write(f"[bench_dist] {n_dev} devices, mode={mode}\n")

    def timed(fn, *args, iters=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        _ = jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
        return (time.perf_counter() - t0) / iters

    results = {"mode": mode, "devices": n_dev}
    rng = np.random.default_rng(0)

    # --- dp (limb)-sharded N=2^16 NTT: zero-communication scaling ---------
    # BENCH_DIST_QUICK=1 shrinks the shapes for CPU-mesh smoke validation
    # (the full N=2^16/2^17 u64 path takes >30 min of CPU; the program
    # structure, shardings, and bit-exact fences are size-independent)
    quick = os.environ.get("BENCH_DIST_QUICK") == "1"
    if quick:
        results["quick"] = True
    N, L, B = (1 << 12, 8, 8) if quick else (1 << 16, 16, 8)
    primes = generate_primes_1mod(L, 35, 2 * N)
    plan = FourStepPlan.make(N, primes)
    ntt = FourStepNTT(plan)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, size=(B, N), dtype=np.uint64) for q in primes]))
    mesh1 = Mesh(np.array(devs[:1]), ("limb",))
    meshN = Mesh(np.array(devs), ("limb",))
    f1 = jax.jit(ntt.forward,
                 in_shardings=NamedSharding(mesh1, P("limb", None, None)),
                 out_shardings=NamedSharding(mesh1, P("limb", None, None)))
    fN = jax.jit(ntt.forward,
                 in_shardings=NamedSharding(meshN, P("limb", None, None)),
                 out_shardings=NamedSharding(meshN, P("limb", None, None)))
    t1 = timed(f1, x)
    tN = timed(fN, x)
    eff = t1 / (tN * n_dev) if tN > 0 else 0.0
    results["limb_sharded_ntt"] = {
        "t1_ms": round(t1 * 1e3, 2), f"t{n_dev}_ms": round(tN * 1e3, 2),
        "scaling_efficiency": round(eff, 3)}

    # exactness: sharded == single-device
    assert (np.asarray(fN(x)) == np.asarray(f1(x))).all()

    # --- coefficient-sharded N=2^17 with all_to_all stage exchange --------
    N2 = 1 << 13 if quick else 1 << 17
    primes2 = generate_primes_1mod(4, 35, 2 * N2)
    plan2 = FourStepPlan.make(N2, primes2)
    x2 = jnp.asarray(np.stack(
        [rng.integers(0, q, size=(2, N2), dtype=np.uint64)
         for q in primes2]))
    meshC = Mesh(np.array(devs), ("coeff",))
    dist = DistFourStepNTT(plan2, meshC, axis="coeff",
                           use_pallas=not validation_only)
    base = FourStepNTT(plan2)
    fb = jax.jit(base.forward)
    fd = jax.jit(dist.forward)
    tb = timed(fb, x2)
    td = timed(fd, x2)
    assert (np.asarray(fd(x2)) == np.asarray(fb(x2))).all(), \
        "dist NTT != single-device NTT"
    results["coeff_sharded_ntt_2e17"] = {
        "t1_ms": round(tb * 1e3, 2), f"t{n_dev}_ms": round(td * 1e3, 2),
        "speedup": round(tb / td, 2) if td > 0 else None}

    results["cost_model"] = cost_model_inputs(
        plan2, n_dev, measured_ntt16_rate=recorded_ntt16_rate())

    print(json.dumps(results))


def recorded_ntt16_rate() -> float | None:
    """Latest recorded on-chip N=2^16 NTT/s (BENCH_r*.json, newest non-zero).

    The cost model's compute anchor must be a hardware number; the driver
    records one per round.  Returns None when no round has a non-zero value
    (e.g. the round-3 tunnel outage) so the caller falls back to the
    standing BASELINE.md figure and flags it "assumed".
    """
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for f in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(f) as fh:
                rec = json.load(fh)
            rec = rec.get("parsed", rec)
            if (rec.get("value") or 0) > 0 and "NTT" in str(rec.get("metric", "")):
                best = float(rec["value"])
        except (OSError, ValueError):
            continue
    return best


def cost_model_inputs(plan, d: int, hosts: int = 2,
                      measured_ntt16_rate: float | None = None) -> dict:
    """2-host scaling cost model for the coeff-sharded four-step NTT
    (VERDICT r3 Next #7; full derivation in docs/PERF.md round 4).

    Exact byte counts of the ONE all_to_all stage exchange
    (dist_ntt.py fwd_local) per (poly, limb), plus projected 2-host
    efficiency at parameterized link speeds.  Bandwidth defaults are
    public v5e figures and are explicitly overridable:
      MFHE_ICI_GBPS (per-chip one-way all_to_all bandwidth, default 45)
      MFHE_DCN_GBPS (per-host cross-host bandwidth, default 25)
    The compute anchor is the measured single-chip NTT/s at N=2^16 when
    available (pass measured_ntt16_rate), else the standing BENCH number
    (109.6k/s, flagged "assumed").
    """
    N = plan.n
    rate16 = measured_ntt16_rate or 109.6e3
    # per-poly MAC scaling vs the N=2^16 (256x256) anchor: N*(n1+n2)
    mac_ratio = (N * (plan.n1 + plan.n2)) / ((1 << 16) * 512)
    t_poly = mac_ratio / rate16                       # serial seconds/poly
    ici_bw = float(os.environ.get("MFHE_ICI_GBPS", "45")) * 1e9
    dcn_bw = float(os.environ.get("MFHE_DCN_GBPS", "25")) * 1e9

    # one all_to_all of the [n1, n2]-tile, 8 B/coeff (u32 lo/hi pair):
    bytes_total = 8 * N * (d - 1) // d                # all devices, per poly-limb
    bytes_per_dev = bytes_total // d                  # each device sends this
    # fraction of (src, dst) pairs crossing the host bisection = 1/hosts
    # each way for equal hosts: one-way cross-DCN bytes per poly-limb
    bytes_dcn_oneway = 8 * N // (2 * hosts)

    t_comp_dev = t_poly / d                           # per poly-limb, per device
    t_ici = bytes_per_dev / ici_bw
    t_dcn = bytes_dcn_oneway / dcn_bw / (hosts / 2)   # per-host NIC serializes
    t_comm = max(t_ici, t_dcn)
    # per-host compute share (all d chips work on the same poly)
    t_comp_host = t_poly / hosts
    eff_serial = t_comp_dev / (t_comp_dev + t_comm)
    eff_pipelined = t_comp_dev / max(t_comp_dev, t_comm)

    # Sensitivity: efficiency vs DCN bandwidth (ICI held at its assumption),
    # plus the analytic crossover bandwidth where coeff-sharding clears 85%
    # (VERDICT r4 Next #7).  Pipelined >=85% needs t_dcn <= t_comp_dev/0.85
    # (and t_ici under the same bound); serial needs t_comm <= t_comp_dev*(1/0.85-1).
    def _eff_at(dcn_gbps: float) -> tuple[float, float]:
        tc = max(t_ici, bytes_dcn_oneway / (dcn_gbps * 1e9) / (hosts / 2))
        return (t_comp_dev / (t_comp_dev + tc),
                t_comp_dev / max(t_comp_dev, tc))

    sensitivity = [
        {"dcn_gbps": g,
         "eff_serial": round(_eff_at(g)[0], 3),
         "eff_pipelined": round(_eff_at(g)[1], 3)}
        for g in (5, 10, 25, 50, 100, 200, 400)]
    dcn_rate = bytes_dcn_oneway / (hosts / 2)         # bytes/s numerator
    xover_pipe = dcn_rate / (t_comp_dev / 0.85) / 1e9
    xover_serial = dcn_rate / (t_comp_dev * (1 / 0.85 - 1)) / 1e9
    ici_ok_85 = t_ici <= t_comp_dev / 0.85

    return {
        "config": {"N": N, "n1": plan.n1, "n2": plan.n2, "devices": d,
                   "hosts": hosts},
        "anchor_ntt16_per_sec": rate16,
        "anchor_is_measured": measured_ntt16_rate is not None,
        "assumed_ici_gbps": ici_bw / 1e9,
        "assumed_dcn_gbps": dcn_bw / 1e9,
        "per_poly_limb": {
            "a2a_bytes_per_device": bytes_per_dev,
            "a2a_bytes_total": bytes_total,
            "dcn_bytes_oneway": bytes_dcn_oneway,
            "compute_us_per_device": round(t_comp_dev * 1e6, 2),
            "compute_us_per_host": round(t_comp_host * 1e6, 2),
            "ici_us": round(t_ici * 1e6, 2),
            "dcn_us": round(t_dcn * 1e6, 2),
        },
        "projected_efficiency_no_overlap": round(eff_serial, 3),
        "projected_efficiency_limb_pipelined": round(eff_pipelined, 3),
        "comm_bound": t_comm > t_comp_dev,
        "dcn_sensitivity": sensitivity,
        "dcn_crossover_gbps_85pct_pipelined": (
            round(xover_pipe, 1) if ici_ok_85 else None),
        "dcn_crossover_gbps_85pct_serial": round(xover_serial, 1),
        "crossover_note": ("min per-host DCN bandwidth at which the coeff-"
                           "sharded form clears 85% 2-host efficiency; "
                           "pipelined crossover is None when the ICI "
                           "assumption alone already caps below 85%"),
        "note": ("limb/batch sharding is zero-comm (100% efficiency) "
                 "whenever independent work B*L >= devices — the "
                 "throughput config; coeff-sharding is the single-"
                 "transform latency tool and needs the all_to_all "
                 "pipelined across independent limbs to clear 85%"),
    }


if __name__ == "__main__":
    main()
