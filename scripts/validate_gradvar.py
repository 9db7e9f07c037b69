"""Gradient-variance parity record — the reference's var suite
(scripts/run-experiments.py var_exps + scripts/plot-var.py:24-48) on the
Cora replica dataset.

Protocol per the reference: train ONCE with CV+PP (VarTrainCV /
DVarTrainCV), then for each estimator reload the trained weights (+
histories) and run the GradientVariance harness (train.py:241-277 —
`times` full-graph and sampled pred/grad passes; bias/stdev of the
first-layer weight gradient, normalized by the full-gradient magnitude).
Grid: {NS (no PP), NS+PP, CV+PP} without dropout and {NS, NS+PP, CV+PP,
CVD+PP} with dropout — exactly the reference's VarNS/VarNSPP/VarCV and
DVar* rows.

Expected orderings asserted (the paper's Fig. 4 / plot-var content):
* without dropout, CV's gradient bias ~ 0 at convergence (Theorem 2) and
  its stdev is below NS+PP's;
* with dropout, CV is no longer bias-free but CVD's stdev stays below
  NS+PP's (variance-corrected dropout);
* every sampled estimator's bias/stdev is finite and recorded.

Writes GRADVAR_VALIDATION.json at the repo root; exits nonzero on a
failed ordering.  ~6 min on CPU (default); --platform tpu for the chip.
"""
import sys, os
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
import argparse
import json
import time

from validate_replica import build_cora_replica  # noqa: E402 (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--times", type=int, default=400,
                    help="resamples per estimator (reference uses 1000; "
                         "400 gives the same orderings in a third of the "
                         "time — stdev estimates are +-5% at 400)")
    ap.add_argument("--tmp", default="/tmp/gradvar_validation")
    ap.add_argument("--out", default=os.path.join(_ROOT,
                                                  "GRADVAR_VALIDATION.json"))
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=1")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.data import loaders as L
    from stochastic_gcn_tpu.training.loop import Trainer

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    cora_dir = build_cora_replica(args.tmp)

    results = {"device": str(jax.devices()[0]), "times": args.times}
    t_all = time.time()

    # (suite, trainer overrides, [(algo, gradvar overrides), ...]) —
    # reference var_exps rows; D* = with dropout (run-experiments.py:23-32)
    suites = [
        ("nodrop", dict(dropout=0.0, cv=True, test_cv=True, degree=1),
         [("NS", dict(degree=1, preprocess=False, test_preprocess=False,
                      cv=False, test_cv=False)),
          ("NSPP", dict(degree=1, cv=False, test_cv=False)),
          ("CVPP", dict(degree=1, cv=True, test_cv=True))]),
        ("dropout", dict(cv=True, test_cv=True, degree=1),
         [("NS", dict(degree=1, preprocess=False, test_preprocess=False,
                      cv=False, test_cv=False)),
          ("NSPP", dict(degree=1, cv=False, test_cv=False)),
          ("CVPP", dict(degree=1, cv=True, test_cv=True))]),
        ("dropout_cvd", dict(cv=True, cvd=True, test_cv=True, test_cvd=True,
                             degree=1),
         [("CVDPP", dict(degree=1, cv=True, cvd=True, test_cv=True,
                         test_cvd=True))]),
    ]

    for suite, train_over, algos in suites:
        ckpt = os.path.join(args.tmp, f"ckpt_{suite}")
        base = Config(dataset="cora", data_dir=cora_dir, test_degree=10000,
                      epochs=200, early_stopping=10, seed=1,
                      batch_size=1000, test_batch_size=1000,
                      ckpt_dir=ckpt)
        ds = L.load_gcn_data("cora", base)
        t0 = time.time()
        tr = Trainer(base.replace(**train_over), ds)
        tr.sgd_train(log=lambda *a: None)
        log(f"[{suite}] trained CV model in {time.time()-t0:.0f}s")
        del tr

        res = {}
        for name, over in algos:
            cfg = base.replace(gradvar=True, load=True, **over)
            tr = Trainer(cfg, ds)
            tr.load()
            t0 = time.time()
            r = tr.gradient_variance(times=args.times, log=lambda *a: None)
            res[name] = {k: round(float(v), 5) for k, v in r.items()}
            log(f"[{suite}] {name:6s} grad_bias={res[name]['grad_bias']:.4f} "
                f"grad_stdev={res[name]['grad_stdev']:.4f} "
                f"(full_stdev={res[name]['full_grad_stdev']:.4f}, "
                f"{time.time()-t0:.0f}s)")
            del tr
        results[suite] = res

    # ---- ordering assertions (plot-var.py's content) ---------------------
    failures = []
    nd, dr = results["nodrop"], results["dropout"]
    cvd = results["dropout_cvd"]["CVDPP"]

    def check(cond, msg):
        if not cond:
            failures.append(msg)

    check(nd["CVPP"]["grad_bias"] < 0.05,
          f"no-dropout CV grad bias {nd['CVPP']['grad_bias']} not ~0 "
          "(Theorem 2: CV is exact at convergence)")
    check(nd["CVPP"]["grad_bias"] < nd["NSPP"]["grad_bias"],
          "no-dropout CV grad bias not below NS+PP's")
    check(nd["CVPP"]["grad_stdev"] < nd["NSPP"]["grad_stdev"],
          f"no-dropout CV grad stdev {nd['CVPP']['grad_stdev']} not below "
          f"NS+PP {nd['NSPP']['grad_stdev']}")
    check(cvd["grad_stdev"] < dr["NSPP"]["grad_stdev"],
          f"dropout CVD grad stdev {cvd['grad_stdev']} not below NS+PP "
          f"{dr['NSPP']['grad_stdev']}")
    for suite, res in (("nodrop", nd), ("dropout", dr),
                       ("dropout_cvd", results["dropout_cvd"])):
        for algo, r in res.items():
            import math
            check(all(math.isfinite(v) for v in r.values()),
                  f"{suite}/{algo}: non-finite stats {r}")

    results["failures"] = failures
    results["passed"] = not failures
    results["wall_s"] = round(time.time() - t_all, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"metric": "gradvar_parity", "passed": not failures,
                      "failures": failures,
                      "cv_nodrop_grad_bias": nd["CVPP"]["grad_bias"],
                      "cv_nodrop_grad_stdev": nd["CVPP"]["grad_stdev"],
                      "nspp_nodrop_grad_stdev": nd["NSPP"]["grad_stdev"]}))
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
