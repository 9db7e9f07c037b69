"""Experiment generator — emits run_<dataset>.sh / test.sh / var.sh sweeps.

Port of the reference's scripts/run-experiments.py:7-88 with identical
algorithm grid (Exact / NS / NS+PP / IS+PP / CV+PP / CVD+PP, dropout on/off,
multi-seed), targeting this package's CLI recipes in configs/.
"""

import os

DATASETS_RUNS = [("citeseer", 10), ("cora", 10), ("pubmed", 10),
                 ("nell", 10), ("ppi", 5), ("reddit", 5)]
GCN_DATASETS = {"cora", "citeseer", "pubmed", "nell"}

# (degree, cv-mode, dropout-on, preprocess)
GRID = [(20, "False", "True", True),   # Exact
        (1, "False", "True", False),   # NS
        (1, "False", "True", True),    # NS+PP
        (1, "IS", "True", True),       # IS+PP
        (1, "True", "True", True),     # CV+PP
        (1, "TrueD", "True", True),    # CVD+PP
        (20, "False", "False", True),  # Exact, no dropout
        (1, "False", "False", False),  # NS, no dropout
        (1, "False", "False", True),   # NS+PP, no dropout
        (1, "IS", "False", True),      # IS+PP, no dropout
        (1, "True", "False", True)]    # CV+PP, no dropout

TEST_EXPS = [("Exact", "--test_degree 10000"),
             ("NS", "--test_degree 1 --nopreprocess --notest_preprocess"),
             ("NSPP", "--test_degree 1"),
             ("NSCV", "--test_degree 1 --cv --test_cv")]

VAR_EXPS = [
    ("VarTrainCV", "--test_degree=10000 --dropout 0 --cv --degree=1"),
    ("VarNS", "--test_degree=10000 --dropout 0 --load --gradvar "
              "--nopreprocess --degree=1"),
    ("VarNSPP", "--test_degree=10000 --dropout 0 --load --gradvar "
                "--degree=1"),
    ("VarCV", "--test_degree=10000 --dropout 0 --load --gradvar --degree=1 "
              "--cv"),
    ("DVarTrainCV", "--test_degree=10000 --cv --degree=1"),
    ("DVarNS", "--test_degree=10000 --load --gradvar --nopreprocess "
               "--degree=1"),
    ("DVarNSPP", "--test_degree=10000 --load --gradvar --degree=1"),
    ("DVarCV", "--test_degree=10000 --load --gradvar --degree=1 --cv"),
    ("DVarTrainCVD", "--test_degree=10000 --cv --cvd --degree=1"),
    ("DVarCVD", "--test_degree=10000 --load --gradvar --degree=1 --cv "
                "--cvd")]


def main(outdir="."):
    os.makedirs(outdir, exist_ok=True)
    files = {d: open(os.path.join(outdir, f"run_{d}.sh"), "w")
             for d, _ in DATASETS_RUNS}
    ftest = open(os.path.join(outdir, "test.sh"), "w")
    fvar = open(os.path.join(outdir, "var.sh"), "w")

    for data, n_runs in DATASETS_RUNS:
        for deg, cv, drop, pp in GRID:
            if data == "nell" and not pp:
                continue
            for run in range(n_runs):
                drop_str = "" if drop == "True" else "--dropout 0"
                if data in GCN_DATASETS:
                    epochs = 400
                elif data == "ppi":
                    epochs = 100
                else:
                    epochs = 100 if (not pp and deg == 1
                                     and cv == "False") else 50
                cv_str = {"False": "--cv=False", "True": "--cv=True",
                          "IS": "--importance",
                          "TrueD": "--cv --cvd"}[cv]
                log = (f"logs/{data}_pp{pp}_dropout{drop}_deg{deg}_cv{cv}"
                       f"_run{run}.log")
                cmd = (f"stdbuf -o 0 sh configs/{data}.sh "
                       f"--early_stopping=1000000 --data=0 "
                       f"--epochs={epochs} {drop_str} --preprocess={pp} "
                       f"--degree={deg} {cv_str} --seed={run} | tee {log}")
                files[data].write(cmd + "\n")

        ftest.write(f"stdbuf -o 0 sh configs/{data}.sh "
                    f"| tee logs/train_{data}.log\n")
        for name, param in TEST_EXPS:
            ftest.write(f"stdbuf -o 0 sh configs/{data}.sh --load {param} "
                        f"| tee logs/test_{data}_{name}.log\n")
        for name, param in VAR_EXPS:
            fvar.write(f"stdbuf -o 0 sh configs/{data}.sh {param} "
                       f"| tee logs/{name}_{data}.log\n")

    for f in list(files.values()) + [ftest, fvar]:
        f.close()
    print("wrote run_<dataset>.sh, test.sh, var.sh")


if __name__ == "__main__":
    main()
