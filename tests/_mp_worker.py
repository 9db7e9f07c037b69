"""Worker for tests/test_multiprocess.py: one controller of a 2-process
dp=8 CPU mesh.  Usage: python tests/_mp_worker.py PORT PID OUT_JSON"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from stochastic_gcn_tpu.config import Config
    from stochastic_gcn_tpu.parallel.distributed import maybe_initialize
    from stochastic_gcn_tpu.data.loaders import synthetic_dataset
    from stochastic_gcn_tpu.training.loop import Trainer

    cfg = Config(dataset="synthetic", batch_size=32, degree=1,
                 test_degree=1, cv=True, test_cv=True, hidden1=16,
                 normalization="graphsage", layer_norm=True, dropout=0.2,
                 weight_decay=0.0, seed=1, dp=8, dp_hosts=2,
                 test_batch_size=64,
                 coordinator=f"localhost:{port}", num_processes=2,
                 process_id=pid)
    proc = maybe_initialize(cfg)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    assert len(jax.local_devices()) == 4

    ds = synthetic_dataset(num_nodes=128, feature_dim=16, num_classes=4,
                           avg_degree=4, seed=0, normalization="graphsage")
    tr = Trainer(cfg, ds)
    losses = []
    for _ in range(2):
        loss, acc, _, _ = tr.train_epoch()
        losses.append(loss)
    vloss, vacc, micro, macro, _ = tr.evaluate(ds.val_d)

    # checkpoint round-trip across controllers: sharded histories gather
    # over the coordinator, process 0 writes, both reload + keep training
    tr.cfg = cfg.replace(ckpt_dir=os.path.dirname(out_path))
    tr.save()
    tr.load(load_history=True)
    loss_resumed, _, _, _ = tr.train_epoch()
    # the default --load path (load_history=False) keeps the LIVE sharded
    # histories — must not crash trying to host-fetch them (regression:
    # global_put passes committed global arrays through)
    tr.load(load_history=False)
    loss_resumed2, _, _, _ = tr.train_epoch()

    with open(out_path, "w") as f:
        json.dump({"process": proc, "losses": losses, "val_loss": vloss,
                   "val_acc": vacc, "micro": micro,
                   "loss_resumed": loss_resumed,
                   "loss_resumed_nohist": loss_resumed2}, f)
    print("worker", proc, "done", flush=True)


if __name__ == "__main__":
    main()
