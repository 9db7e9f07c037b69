"""Checkpoint / resume.

The reference saves trainable vars + history Variables once at the end of
training via tf.train.Saver (gcn/models.py:204-220, train.py:238) to
``tmp/model.ckpt``.  Here the whole train state (params, Adam state,
per-layer histories, RNG key) round-trips through a single compressed npz of
the flattened pytree — covering the reference's save/load plus optimizer
state and sampler RNG, which the reference loses on resume.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np

import jax


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_checkpoint(ckpt_dir: str, state, eval_histories, key,
                    name: str = "model") -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{name}.ckpt.npz")
    payload = {"state": state, "eval_histories": eval_histories, "key": key}
    leaves, treedef = jax.tree_util.tree_flatten(payload)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    with open(path, "wb") as f:
        np.savez_compressed(f, treedef=np.frombuffer(
            pickle.dumps(treedef), dtype=np.uint8), **arrays)
    print(f"Model saved in file: {path}")
    return path


def load_checkpoint(ckpt_dir: str, state_template, eval_hist_template,
                    key_template, load_history: bool = True,
                    name: str = "model"):
    path = os.path.join(ckpt_dir, f"{name}.ckpt.npz")
    z = np.load(path, allow_pickle=False)
    treedef = pickle.loads(z["treedef"].tobytes())
    n_leaves = len([k for k in z.files if k.startswith("leaf_")])
    leaves = [z[f"leaf_{i}"] for i in range(n_leaves)]
    payload = jax.tree_util.tree_unflatten(treedef, leaves)
    state, eval_hist, key = (payload["state"], payload["eval_histories"],
                             payload["key"])
    # Reconcile the Polyak average with the CURRENT run's polyak_decay:
    # a checkpoint saved without it (avg_params=None) must not clobber a
    # resuming polyak run (the step's EMA tree_map would crash on None) —
    # re-seed the average from the restored weights; conversely drop a
    # saved average when the new run has polyak off.
    t_avg = getattr(state_template, "avg_params", None)
    s_avg = getattr(state, "avg_params", None)
    if t_avg is not None and s_avg is None:
        state = dataclasses.replace(
            state, avg_params=jax.tree_util.tree_map(np.array, state.params))
    elif t_avg is None and s_avg is not None:
        state = dataclasses.replace(state, avg_params=None)
    if not load_history:
        # keep the caller's (zero) histories, restore weights/opt only
        state = type(state_template)(
            params=state.params, opt_state=state.opt_state,
            histories=state_template.histories, step=state.step,
            avg_params=state.avg_params)
        eval_hist = eval_hist_template
    print(f"Model restored from file: {path}")
    return state, eval_hist, key
