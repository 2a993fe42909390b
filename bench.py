"""Benchmark: batched trajectory-optimization throughput on one chip.

Two lanes, both end-to-end interior-point solves in f32 on the local
accelerator:

1. NORTH STAR (headline metric): batched 2D-walking MocoTrack solves
   (BASELINE.json's target config; reference example2DWalking.cpp:55-185
   gaitTracking — 10 DoF, 18 DGF muscles, contact spheres, half-cycle
   symmetry, GRF tracking) at 15 mesh intervals, B=8 (r5 sweep: B=16
   crashes the v5-lite runtime, B=8 is the throughput knee; solver r5:
   LS multiplier init + kappa_eps=100 cut mean iterations 221 -> ~114,
   acceptable_iter=5 + max_ls=6 trim the tail).
   A final full-resolution lane solves ONE 50-mesh-interval tracking
   problem (the reference's own config, example2DWalking.cpp:66) and
   reports wall-clock + tracking RMS vs the reference kinematics.
2. exampleHangingMuscle (BASELINE.json correctness config) with FULL
   muscle dynamics — activation + implicit tendon compliance, mirroring
   testMocoActuators.cpp:1088 — B=32 jittered guesses, plus the
   r1-r3-comparable simplified variant (rigid tendon, no activation
   dynamics) for cross-round continuity.

vs_baseline: the reference (single-threaded CasADi+IPOPT, FD derivatives)
could not be built in this image (empty opensim-core/simbody submodules,
no network). Its wall-clock for the 2D-walking tracking problem is
estimated at 300 s/solve on a CPU core (the example's own docs describe
~minutes-scale solves; Falisse et al. 2019 report minutes for equivalent
AD-based gait problems, example2DWalking.cpp:23-26), i.e. ~0.0033
solves/s. vs_baseline = measured / 0.0033.

Prints ONE JSON line. Partial results are checkpointed to
BENCH_PARTIAL.json as lanes finish, in case of an external timeout.
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))

import jax.numpy as jnp
import numpy as np

PARTIAL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_PARTIAL.json")


def _timed_batch(batched, Z0, tol):
    # warm up on a perturbed copy: the tunneled TPU runtime memoizes
    # identical (executable, input) executions, so timing a repeat of the
    # warm-up input can read ~0 s (observed r5)
    batched(Z0 + jnp.asarray(1e-6, Z0.dtype)).z.block_until_ready()
    t0 = time.perf_counter()
    res = batched(Z0)
    res.z.block_until_ready()
    dt = time.perf_counter() - t0
    conv, strict, mit = jax.device_get(
        (jnp.sum(res.converged),
         # strict-tolerance exits vs acceptable-level exits (IPOPT's
         # "Solved To Acceptable Level"), reported separately per VERDICT r4
         jnp.sum(res.converged & (res.kkt_error <= tol)),
         jnp.mean(res.iterations.astype(jnp.float32))))
    return dt, int(conv), int(strict), float(mit)


def lane_hanging(full_dynamics):
    from opensim_moco_tpu.examples import hanging_muscle_study
    from opensim_moco_tpu.parallel import batch_guesses
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    study = hanging_muscle_study(
        25,
        ignore_tendon_compliance=not full_dynamics,
        ignore_activation_dynamics=not full_dynamics,
        tendon_dynamics_implicit=full_dynamics)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = tr.initial_guess(dtype=jnp.float32)
    opts = IPMOptions(tol=3e-3, max_iter=200 if full_dynamics else 150,
                      bound_relax=1e-6, mu_init=1e-2, kappa_eps=100.0,
                      acceptable_tol_factor=30.0, acceptable_iter=10,
                      max_rescues=100)
    solve = make_solver(nlp, opts, scale_z0=z0)
    batched = jax.jit(jax.vmap(solve))
    B = 32
    Z0 = batch_guesses(tr, B, scale=0.05, seed=0).astype(jnp.float32)
    dt, conv, strict, mit = _timed_batch(batched, Z0, opts.tol)
    return {"batch": B, "converged": conv, "strict": strict,
            "mean_iterations": mit,
            "wall_s_per_batch": round(dt, 3),
            "solves_per_s": round(B / dt, 3),
            "converged_solves_per_s": round(conv / dt, 3)}


def lane_gait2d():
    from opensim_moco_tpu.examples import gait2d_tracking_study
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver

    study, guess = gait2d_tracking_study(num_mesh_intervals=15, tol=1e-3)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = np.asarray(guess, dtype=np.float32)
    opts = IPMOptions(tol=1e-4, max_iter=250, mu_init=1e-2, max_rescues=100,
                      kappa_eps=100.0,
                      acceptable_tol_factor=30.0, acceptable_iter=5,
                      max_ls=6,
                      hessian_approximation="objective-only")
    solve = make_solver(nlp, opts, scale_z0=z0)
    B = 8
    rng = np.random.default_rng(0)
    Z0 = np.stack([z0] + [z0 + 0.005 * rng.standard_normal(
        z0.shape).astype(np.float32) for _ in range(B - 1)])
    batched = jax.jit(jax.vmap(solve))
    dt, conv, strict, mit = _timed_batch(batched, jnp.asarray(Z0), opts.tol)
    return {"batch": B, "converged": conv, "strict": strict,
            "mean_iterations": mit,
            "wall_s_per_batch": round(dt, 3),
            "solves_per_s": round(B / dt, 4),
            "converged_solves_per_s": round(conv / dt, 4)}


def lane_gait2d_full50(mesh=50):
    """ONE solve at the reference's own resolution (50 mesh intervals,
    example2DWalking.cpp:66): wall-clock + states-tracking RMS vs the
    reference kinematics (acceptance bar 1e-2, testMocoTrack.cpp:66).
    The v5-lite runtime faults on the mesh-50 program (r5: reproducible
    'TPU device error' at execution, also seen at B=16 x mesh-15); main()
    falls back through smaller meshes and reports the mesh used."""
    from opensim_moco_tpu.examples import gait2d_tracking_study
    from opensim_moco_tpu.solver.ipm import IPMOptions, make_solver
    from opensim_moco_tpu.utils.tables import read_sto

    study, guess = gait2d_tracking_study(num_mesh_intervals=mesh, tol=1e-3)
    tr = study.transcription()
    nlp = tr.make_nlp()
    z0 = np.asarray(guess, dtype=np.float32)
    opts = IPMOptions(tol=1e-4, max_iter=400, mu_init=1e-2, max_rescues=100,
                      kappa_eps=100.0,
                      acceptable_tol_factor=30.0, acceptable_iter=5,
                      max_ls=6,
                      hessian_approximation="objective-only")
    solve = jax.jit(make_solver(nlp, opts, scale_z0=z0))
    zj = jnp.asarray(z0)
    solve(zj + jnp.float32(1e-6)).z.block_until_ready()  # compile warm-up
    t0 = time.perf_counter()
    res = solve(zj)
    res.z.block_until_ready()
    dt = time.perf_counter() - t0
    t0g, tfg, Y, X = jax.device_get(
        (res.z[0], res.z[1],
         res.z[tr.offsets["states"][0]:tr.offsets["states"][1]].reshape(
             tr.G, tr.ny), res.converged))
    ts = t0g + (tfg - t0g) * np.asarray(tr.taus)
    ref = read_sto("/root/reference/Moco/Examples/C++/example2DWalking/"
                   "referenceCoordinates.sto")
    errs = []
    for j, n in enumerate(tr.rep.state_names):
        if n in ref.column_names:
            r = np.interp(ts, ref.time, ref.column(n))
            errs.append(np.sqrt(np.mean((np.asarray(Y)[:, j] - r) ** 2)))
    rms = float(np.sqrt(np.mean(np.square(errs)))) if errs else float("nan")
    return {"mesh": mesh, "wall_s": round(dt, 2),
            "converged": bool(jax.device_get(res.converged)),
            "iterations": int(jax.device_get(res.iterations)),
            "kkt": float(jax.device_get(res.kkt_error)),
            "tracking_rms": round(rms, 5)}


def _checkpoint(out):
    with open(PARTIAL, "w") as fh:
        json.dump(out, fh)


def main():
    t_start = time.perf_counter()
    dev = str(jax.devices()[0])
    out = {"device": dev}

    # headline lane FIRST so an external timeout can't lose it (the r5
    # driver run died mid-compile with only the hanging lanes recorded)
    try:
        g = lane_gait2d()
    except Exception as e:
        g = {"error": str(e)[:160], "batch": 8, "converged": 0, "strict": 0,
             "solves_per_s": 0.0}
    out["gait2d_track"] = g
    _checkpoint(out)

    try:
        hs = lane_hanging(full_dynamics=False)
    except Exception as e:
        hs = {"error": str(e)[:160], "batch": 32, "converged": 0,
              "solves_per_s": 0.0}
    out["hanging_muscle_simplified"] = hs
    _checkpoint(out)

    try:
        hf = lane_hanging(full_dynamics=True)
    except Exception as e:
        hf = {"error": str(e)[:160], "batch": 32, "converged": 0,
              "solves_per_s": 0.0}
    out["hanging_muscle_full_dynamics"] = hf
    _checkpoint(out)

    # full-resolution lane LAST with a wall budget: mesh-50/40 programs can
    # each burn minutes of compile before the known v5-lite runtime fault
    f50 = {"skipped": "time budget"}
    for mesh in (50, 40, 30):
        if time.perf_counter() - t_start > 2400:
            break
        try:
            f50 = lane_gait2d_full50(mesh)
            break
        except Exception as e:  # device fault: try a smaller program
            f50 = {"error": str(e)[:160], "mesh_failed": mesh}
    out["gait2d_full50"] = f50
    _checkpoint(out)

    baseline_gait = 1.0 / 300.0  # estimated reference solves/s (docstring)
    result = {
        "metric": "gait2d_track_hs15_batched_solves_per_s_per_chip",
        "value": g.get("solves_per_s", 0.0),
        "unit": "solves/s/chip",
        "vs_baseline": round(g.get("solves_per_s", 0.0) / baseline_gait, 1),
        # the reference could not be built in this image (empty
        # opensim-core submodule, no network); 300 s/solve is an estimate,
        # NOT a measurement — see module docstring
        "baseline": "estimated (300 s/solve reference, not measured)",
        "gait2d_converged": f"{g['converged']}/{g['batch']}",
        "gait2d_strict": f"{g.get('strict', 0)}/{g['batch']}",
        "hanging_full_solves_per_s": hf["solves_per_s"],
        "hanging_full_converged": f"{hf['converged']}/{hf['batch']}",
        "hanging_full_strict": f"{hf.get('strict', 0)}/{hf['batch']}",
        "hanging_simplified_solves_per_s": hs["solves_per_s"],
        "hanging_simplified_converged": f"{hs['converged']}/{hs['batch']}",
        "gait2d_full50_wall_s": f50.get("wall_s"),
        "gait2d_full50_rms": f50.get("tracking_rms"),
        "device": dev,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
