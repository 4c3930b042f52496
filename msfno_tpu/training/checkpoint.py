"""Checkpoint I/O: flattened-pytree .npz files with a JSON config sidecar.

Reference semantics (MSFNO/Models/train.py:779-819, main.py:179-246,
MSFNO/Models/checkpoint.py:9-57): a checkpoint stores model state, optimizer/
scheduler state, step counters and the full hyperparameter set; `peek` reads
the metadata without materializing tensors.

Format here: one .npz per checkpoint.  Pytree leaves are stored under
"/"-joined key paths with prefixes params|opt_state; metadata (step, epoch,
config JSON) under meta/*.  np.load is lazy per entry, so peek() costs only
the zip directory read — the same property the reference gets from its
pickle hack.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any

import jax
import numpy as np
from flax import traverse_util


def _as_plain_dict(tree):
    """Recursively coerce Mapping-like nodes (flax FrozenDict, etc.) to plain
    dicts so flatten/unflatten with sep='/' round-trips.  The old fallback
    serialized non-dict trees via jax keystr paths ("['encoder']['kernel']"),
    which load_checkpoint's sep='/' unflatten could NOT invert — the save
    looked fine and the load produced a corrupt single-level dict."""
    if isinstance(tree, dict):
        return {k: _as_plain_dict(v) for k, v in tree.items()}
    if hasattr(tree, "items"):  # Mapping-like
        return {k: _as_plain_dict(v) for k, v in tree.items()}
    return tree


def _flatten(prefix: str, tree) -> dict[str, np.ndarray]:
    tree = _as_plain_dict(tree)
    if not isinstance(tree, dict):
        raise TypeError(
            f"checkpoint params must be a (possibly frozen) mapping tree, "
            f"got {type(tree).__name__}"
        )
    flat = traverse_util.flatten_dict(tree, sep="/")
    return {f"{prefix}/{k}": np.asarray(v) for k, v in flat.items()}


def save_checkpoint(
    path: str,
    params: dict,
    opt_state=None,
    step: int = 0,
    epoch: int = 0,
    config_json: str = "{}",
    extra: dict[str, Any] | None = None,
) -> str:
    arrays = _flatten("params", params)
    meta = {
        "step": int(step),
        "epoch": int(epoch),
        "config": config_json,
        "format_version": 1,
    }
    if extra:
        meta.update(extra)
    arrays["meta/json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ).copy()
    if opt_state is not None:
        opt_leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(opt_leaves):
            arrays[f"opt_state/{i}"] = np.asarray(leaf)
        arrays["meta/opt_num_leaves"] = np.asarray(len(opt_leaves))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    return path


def is_orbax_dir(path: str) -> bool:
    """An orbax checkpoint saved by `save_checkpoint_orbax`: a directory
    carrying our meta.json sidecar — or, crash-recovery case, a committed
    orbax tree whose sidecar never landed (async save killed between orbax
    commit and the meta drain; the meta is then recovered from the
    payload's own meta_json leaf, see peek_orbax)."""
    if not os.path.isdir(path):
        return False
    if os.path.exists(os.path.join(path, "meta.json")):
        return True
    return any(
        os.path.exists(os.path.join(path, marker))
        for marker in ("_METADATA", "manifest.ocdbt", "_CHECKPOINT_METADATA")
    )


def peek(path: str) -> dict[str, Any]:
    """Checkpoint metadata without loading tensor data (reference peek(),
    checkpoint.py:44-57).  Accepts both formats: .npz files and orbax
    directories (so --resume-checkpoint works on multi-host sharded saves)."""
    if is_orbax_dir(path):
        return peek_orbax(path)
    if os.path.isdir(path):
        raise FileNotFoundError(
            f"{path} is a directory but has no meta.json — not an orbax "
            f"checkpoint saved by this framework"
        )
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta/json"]).decode())
        meta["keys"] = [k for k in z.files if k.startswith("params/")]
    return meta


def load_checkpoint(path: str, opt_state_template=None):
    """Returns (params, opt_state|None, meta).  Dispatches on format: .npz
    file or orbax directory — every consumer (CLI resume, --film-weights /
    --sfno-weights overlays, eval sweeps, registry wrappers) accepts both."""
    if is_orbax_dir(path):
        return load_checkpoint_orbax(path, opt_state_template)
    if os.path.isdir(path):
        raise FileNotFoundError(
            f"{path} is a directory but has no meta.json — not an orbax "
            f"checkpoint saved by this framework"
        )
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta/json"]).decode())
        flat_params = {
            k[len("params/") :]: z[k] for k in z.files if k.startswith("params/")
        }
        params = traverse_util.unflatten_dict(flat_params, sep="/")
        opt_state = None
        if opt_state_template is not None and "meta/opt_num_leaves" in z.files:
            n = int(z["meta/opt_num_leaves"])
            leaves = [z[f"opt_state/{i}"] for i in range(n)]
            treedef = jax.tree_util.tree_structure(opt_state_template)
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, meta


# one async checkpointer per process; a new async save waits for the
# previous one (orbax requirement), and wait_for_async_saves() drains it
# at trainer finalize/exit so a crash-free run never loses the tail save.
# meta.json for an async save is deferred until its commit (orbax renames
# its tmp tree onto `path` at commit — a sidecar written earlier would
# collide with that rename), tracked in _PENDING_META.
_ASYNC_CKPTR = None
_PENDING_META: tuple[str, dict] | None = None


def _flush_pending_meta() -> None:
    global _PENDING_META
    if _PENDING_META is None:
        return
    path, meta = _PENDING_META
    _PENDING_META = None
    if jax.process_index() == 0 and os.path.isdir(path):
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))


def wait_for_async_saves() -> None:
    """Block until any in-flight async orbax save has committed (and its
    meta.json sidecar is in place)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    _flush_pending_meta()


def save_checkpoint_orbax(
    path: str,
    params: dict,
    opt_state=None,
    step: int = 0,
    epoch: int = 0,
    config_json: str = "{}",
    extra: dict[str, Any] | None = None,
    async_save: bool = False,
) -> str:
    """Orbax-backed checkpoint directory (same payload contract as
    `save_checkpoint`).

    This is the TPU-production path: orbax writes sharded arrays in
    parallel across hosts (each host stores only its addressable shards),
    which the single-file .npz format cannot do.  Metadata lands in
    `meta.json` next to the tree so `peek` stays a one-small-file read.
    Multi-host REQUIRES `path` on storage shared by every host (NFS/GCS):
    orbax's commit barrier watches the other hosts' markers under the same
    directory — per-host paths deadlock the save (verified by
    tests/test_multiprocess.py against a shared tmp dir).

    async_save=True hands the write to orbax's AsyncCheckpointer: device
    arrays are snapshotted and training resumes immediately while the disk
    write proceeds in the background (a full-size fp32 save is ~10-20 s of
    blocking I/O otherwise).  The next save — or wait_for_async_saves() —
    drains the in-flight write.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta = {
        "step": int(step),
        "epoch": int(epoch),
        "config": config_json,
        "format_version": 1,
        "backend": "orbax",
    }
    if extra:
        meta.update(extra)
    # commit-atomic copy of the metadata: lives inside the orbax tree, so a
    # crash between orbax commit and the (async-deferred) sidecar write
    # cannot orphan an otherwise-valid checkpoint — peek_orbax recovers it
    payload = {
        "params": params,
        "meta_json": np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        ).copy(),
    }
    if opt_state is not None:
        # store leaves positionally (optax state treedefs contain
        # non-serializable nodes); the template restores the structure
        payload["opt_leaves"] = {
            str(i): leaf
            for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state))
        }
    if async_save:
        global _ASYNC_CKPTR, _PENDING_META
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        _ASYNC_CKPTR.wait_until_finished()  # at most one write in flight
        _flush_pending_meta()
        _ASYNC_CKPTR.save(path, payload, force=True)
        # the sidecar lands when THIS save commits (next wait/save drain)
        _PENDING_META = (path, meta)
        return path
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    # meta.json: rank 0 only (every host runs this function under SPMD) and
    # atomic tmp+rename, so a crash mid-write cannot leave a valid-looking
    # orbax tree whose peek/load then fail on truncated JSON
    if jax.process_index() == 0:
        tmp = os.path.join(path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "meta.json"))
    return path


def _restore_orbax_numpy(path: str) -> dict:
    """Restore an orbax tree with every leaf as a HOST numpy array.

    Restoring without explicit restore_args asks orbax to rebuild
    jax.Arrays from the checkpoint's recorded shardings — which fails
    outright for checkpoints written by the ASYNC path (the snapshot
    records concrete device shardings that a fresh process/backend cannot
    resolve: "sharding passed to deserialization should be specified").
    A checkpoint loader must not depend on the saving process's device
    topology; callers re-place arrays on their own mesh afterwards."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        md = ckptr.metadata(path)
        tree = getattr(md, "item_metadata", md)
        tree = getattr(tree, "tree", tree)
        rargs = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
            tree,
            is_leaf=lambda x: not isinstance(x, dict),
        )
        return ckptr.restore(path, restore_args=rargs)


def peek_orbax(path: str) -> dict[str, Any]:
    """meta.json sidecar read; falls back to the commit-atomic meta_json
    leaf stored INSIDE the orbax payload when the sidecar is missing (a
    hard crash after orbax commit but before the async-drain sidecar write
    — the checkpoint is fully valid, only the cheap-peek file is gone).
    The recovered sidecar is re-materialized so later peeks stay cheap."""
    sidecar = os.path.join(path, "meta.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    payload = _restore_orbax_numpy(path)
    blob = payload.get("meta_json")
    if blob is None:
        raise FileNotFoundError(
            f"{path}: no meta.json sidecar and no meta_json leaf in the "
            f"orbax payload — not a checkpoint saved by this framework"
        )
    meta = json.loads(bytes(np.asarray(blob, dtype=np.uint8)).decode())
    if jax.process_index() == 0:
        tmp = sidecar + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, sidecar)
    return meta


def load_checkpoint_orbax(path: str, opt_state_template=None):
    """Returns (params, opt_state|None, meta) from an orbax directory.
    Leaves come back as host numpy arrays regardless of the topology that
    saved them (see _restore_orbax_numpy) — required for async-path saves
    and for restoring a pod checkpoint on a differently-shaped mesh."""
    path = os.path.abspath(path)
    payload = _restore_orbax_numpy(path)
    sidecar = os.path.join(path, "meta.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    else:
        blob = payload.get("meta_json")
        if blob is None:
            raise FileNotFoundError(f"{path}: no meta.json and no meta_json leaf")
        meta = json.loads(bytes(np.asarray(blob, dtype=np.uint8)).decode())
    params = payload["params"]
    opt_state = None
    if opt_state_template is not None and "opt_leaves" in payload:
        leaves = [
            payload["opt_leaves"][str(i)]
            for i in range(len(payload["opt_leaves"]))
        ]
        treedef = jax.tree_util.tree_structure(opt_state_template)
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, meta


def merge_film_checkpoint(backbone_params: dict, film_params: dict) -> dict:
    """Overlay film-generator weights onto a backbone param tree (reference
    film-weights merge, sfno/model.py:909-912, 983-1005)."""
    merged = dict(traverse_util.flatten_dict(backbone_params, sep="/"))
    for k, v in traverse_util.flatten_dict(film_params, sep="/").items():
        merged[k] = v
    return traverse_util.unflatten_dict(merged, sep="/")
