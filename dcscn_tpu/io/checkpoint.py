"""Native checkpoint format: flat .npz pytrees + a JSON sidecar.

Replaces tf.train.Saver (reference: helper/tf_graph.py:263-305). A model
checkpoint is `<dir>/<name>.ckpt.npz` holding every param leaf under a
'path/like/this' key; a full training checkpoint additionally stores
optimizer state and scheduler progress so interrupted runs resume exactly —
the reference could only warm-start weights and restarted the LR schedule
(SURVEY.md §5).

Trial-suffix naming matches the reference: trial > 0 appends "_<trial>"
(tf_graph.py:267-270).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, prefix + str(k) + "/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, prefix + "#%d/" % i))
    elif tree is None:
        pass
    else:
        flat[prefix.rstrip("/")] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return _rebuild_sequences(tree)


def _rebuild_sequences(node: Any) -> Any:
    """Invert _flatten's '#%d' list encoding: a dict whose keys are all
    '#<int>' round-trips back to a list (previously it silently loaded as
    a dict with literal '#0' keys — a structurally different tree)."""
    if not isinstance(node, dict) or not node:
        return node
    node = {k: _rebuild_sequences(v) for k, v in node.items()}
    if all(k.startswith("#") and k[1:].isdigit() for k in node):
        idx = sorted(int(k[1:]) for k in node)
        if idx == list(range(len(idx))):  # dense 0..n-1 (None leaves are
            return [node["#%d" % i] for i in idx]  # dropped by _flatten)
    return node


def checkpoint_path(checkpoint_dir: str, name: str, trial: int = 0) -> str:
    if trial > 0:
        return os.path.join(checkpoint_dir, "%s_%d.ckpt.npz" % (name, trial))
    return os.path.join(checkpoint_dir, "%s.ckpt.npz" % name)


def _atomic_savez(path: str, flat: Dict[str, np.ndarray]) -> None:
    """Write-then-rename so a crash mid-write never corrupts a checkpoint."""
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    # np.savez appends .npz when the name lacks it
    written = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(written, path)


def save_params(
    path: str, params: Any, meta: Optional[Dict[str, Any]] = None
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(params))
    _atomic_savez(path, flat)
    if meta is not None:
        tmp = path + ".json.tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, default=str)
        os.replace(tmp, path + ".json")


def load_params(path: str) -> Dict[str, Any]:
    if not os.path.isfile(path):
        raise FileNotFoundError("Error. [%s] is not exist!" % path)
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)


def load_meta(path: str) -> Optional[Dict[str, Any]]:
    if os.path.isfile(path + ".json"):
        with open(path + ".json") as f:
            return json.load(f)
    return None


def save_train_state(
    path: str,
    params: Any,
    opt_state: Any,
    *,
    bn_state: Any = None,
    step: int = 0,
    epochs_completed: int = 0,
    epochs_in_stage: int = 0,
    lr: float = 0.0,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Full resumable training checkpoint (params + optimizer + schedule)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(
        {
            "params": jax.device_get(params),
            "opt_state": _opt_state_to_tree(opt_state),
            "bn_state": jax.device_get(bn_state) if bn_state is not None else None,
        }
    )
    meta = {
        "step": step,
        "epochs_completed": epochs_completed,
        "epochs_in_stage": epochs_in_stage,
        "lr": lr,
    }
    if extra:
        meta.update(extra)
    # meta rides INSIDE the npz so (state, meta) replace atomically — a
    # crash between two separate file replaces would otherwise pair new
    # params with a stale step/epoch/lr and silently skew the resumed
    # LR schedule; the json sidecar below is a human-readable copy only
    flat["__meta_json__"] = np.frombuffer(
        json.dumps(meta, default=str).encode(), dtype=np.uint8)
    _atomic_savez(path, flat)
    tmp = path + ".json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2, default=str)
    os.replace(tmp, path + ".json")


def load_train_state(path: str, opt_state_template: Any) -> Tuple[Any, Any, Any, Dict[str, Any]]:
    """Returns (params, opt_state, bn_state, meta). `opt_state_template`
    is a freshly initialized optimizer state used to restore structure."""
    tree = load_params(path)
    embedded = tree.pop("__meta_json__", None)
    if embedded is not None:  # atomic with the state (see save_train_state)
        meta = json.loads(np.asarray(embedded).tobytes().decode())
    else:  # older checkpoints: sidecar only
        meta = load_meta(path) or {}
    params = tree.get("params", {})
    bn_state = tree.get("bn_state", None)
    opt_state = _tree_to_opt_state(tree.get("opt_state", {}), opt_state_template)
    return params, opt_state, bn_state, meta


def _opt_state_to_tree(opt_state: Any) -> Any:
    leaves, _ = jax.tree_util.tree_flatten(opt_state)
    return {"leaf%06d" % i: np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)}


def _tree_to_opt_state(tree: Dict[str, np.ndarray], template: Any) -> Any:
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    leaves = [tree["leaf%06d" % i] for i in range(len(leaves_t))]
    leaves = [np.asarray(l, dtype=t.dtype).reshape(np.shape(t)) for l, t in zip(leaves, leaves_t)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
