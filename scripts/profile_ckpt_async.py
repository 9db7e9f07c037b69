"""Async-checkpoint overhead at Reddit scale (VERDICT r4 #5).

Per-epoch wall time of `train_epoch(); save()` loops vs a no-checkpoint
loop, for sync/async x compressed/uncompressed saves.  The async path
returns after the on-chip snapshot; the device->host fetch (~3.2 s
through the tunnel at r4's measurement) and the npz write (0.9-4.9 s)
overlap the next epoch's scan.  Emits one JSON line; results recorded in
PERF.md "Checkpoint cost".
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import shutil
import time

import numpy as np

from bench import build_reddit_like, BATCH, HIDDEN, PAD_DEG


def main():
    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.training.loop import Trainer

    ds = build_reddit_like()
    ckpt_dir = "/tmp/ckpt_prof"
    base = Config(dataset="reddit_like", batch_size=BATCH, degree=1,
                  test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                  normalization="graphsage", layer_norm=True,
                  num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                  pad_degree=PAD_DEG, seed=1, ckpt_dir=ckpt_dir)
    modes = [
        ("none", dict(), False),
        ("sync_comp", dict(ckpt_async=False, ckpt_compress=True), True),
        ("sync_nocomp", dict(ckpt_async=False, ckpt_compress=False), True),
        ("async_comp", dict(ckpt_async=True, ckpt_compress=True), True),
        ("async_nocomp", dict(ckpt_async=True, ckpt_compress=False), True),
    ]
    epochs = 5
    out = {"epochs": epochs}
    for name, over, do_save in modes:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        tr = Trainer(base.replace(**over), ds)
        tr.train_epoch()                      # compile
        _ = int(tr.state.step)                # first-fetch stall
        if do_save:
            tr.save()                         # compile/warm the save path
            tr.finish_checkpoints()
        r0 = time.time()
        _ = int(tr.state.step)
        rtt = time.time() - r0
        save_lat = []
        t0 = time.time()
        for _ in range(epochs):
            tr.train_epoch()
            if do_save:
                s0 = time.time()
                tr.save()
                save_lat.append(time.time() - s0)
        tr.finish_checkpoints()               # async: writes must land
        _ = int(tr.state.step)
        per_epoch = (time.time() - t0 - rtt) / epochs
        out[f"{name}_s_per_epoch"] = round(per_epoch, 3)
        if save_lat:
            out[f"{name}_save_call_s"] = round(float(np.median(save_lat)),
                                               3)
        print(f"{name}: {per_epoch:.3f} s/epoch "
              f"(save call {np.median(save_lat) if save_lat else 0:.3f} s)",
              file=sys.stderr, flush=True)
        del tr
    for m in ("sync_comp", "sync_nocomp", "async_comp", "async_nocomp"):
        out[f"{m}_overhead_s"] = round(
            out[f"{m}_s_per_epoch"] - out["none_s_per_epoch"], 3)
    print(json.dumps(out))


if __name__ == "__main__" and not os.environ.get("CKPT_SPACED"):
    main()


def spaced(epochs_between=5, cycles=2):
    """Spaced-save pattern (ckpt_every=N): per-cycle overhead of
    train-N-epochs + save, sync vs async, vs a no-save baseline."""
    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.training.loop import Trainer

    ds = build_reddit_like()
    ckpt_dir = "/tmp/ckpt_prof_sp"
    base = Config(dataset="reddit_like", batch_size=BATCH, degree=1,
                  test_degree=1, cv=True, test_cv=True, hidden1=HIDDEN,
                  normalization="graphsage", layer_norm=True,
                  num_fc_layers=2, weight_decay=0.0, dropout=0.2,
                  pad_degree=PAD_DEG, seed=1, ckpt_dir=ckpt_dir,
                  ckpt_compress=False)
    out = {"epochs_between": epochs_between, "cycles": cycles}
    for name, over, do_save in [
            ("none", dict(), False),
            ("sync", dict(ckpt_async=False), True),
            ("async", dict(ckpt_async=True), True)]:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        tr = Trainer(base.replace(**over), ds)
        tr.train_epoch()
        _ = int(tr.state.step)
        if do_save:
            tr.save()
            tr.finish_checkpoints()
        r0 = time.time()
        _ = int(tr.state.step)
        rtt = time.time() - r0
        t0 = time.time()
        for _ in range(cycles):
            for _ in range(epochs_between):
                tr.train_epoch()
            if do_save:
                tr.save()
        tr.finish_checkpoints()
        _ = int(tr.state.step)
        total = time.time() - t0 - rtt
        out[f"spaced_{name}_s_per_cycle"] = round(total / cycles, 3)
        print(f"spaced {name}: {total / cycles:.3f} s per "
              f"{epochs_between}-epoch cycle", file=sys.stderr, flush=True)
        del tr
    for m in ("sync", "async"):
        out[f"spaced_{m}_overhead_s"] = round(
            out[f"spaced_{m}_s_per_cycle"] - out["spaced_none_s_per_cycle"],
            3)
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("CKPT_SPACED"):
    spaced()
