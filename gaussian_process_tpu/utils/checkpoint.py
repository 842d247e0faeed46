"""Pytree checkpoint / resume.

The reference's only persistence is dataset caching via ``np.save``/``np.load``
[ref: GP_multi_classification.py:209-210,215-220]. Here checkpointing is a
first-class subsystem (SURVEY.md §5): any JAX pytree — hyperparameters θ,
Cholesky factor L, α, Newton iterate f, BO history — round-trips through an
atomic on-disk format, enabling resume mid-hyperparameter-search and
mid-Newton.

Format: ``<path>/manifest.json`` (treedef + leaf metadata) +
``<path>/arrays.npz`` (the leaves). Writes go to a temp dir then ``os.replace``
so a crash mid-save never corrupts the previous checkpoint.

Multi-host (SURVEY.md §5, checkpoint row): a globally-sharded, NOT
fully-addressable ``jax.Array`` leaf cannot be ``device_get`` whole — each
process slices its OWN ``leaf.addressable_shards`` (deduped by shard index)
into its rank file, with the shard index recorded in the manifest. Restore
rebuilds the global array with ``jax.make_array_from_callback`` against the
``like`` leaf's sharding, each process reading back exactly the shards it
owns — assuming the same process/device topology as at save time, which is
the standard contract for sharded checkpoints. Fully-replicated pytrees can
be saved by rank 0 only (``save(..., per_host=False)``).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Dict, Optional

import numpy as np


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def _flatten(tree: Any):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _index_key(index, shape) -> str:
    """Canonical string for a shard's global slice, e.g. ``0:4,0:8``
    (None slice bounds resolved against the global shape)."""
    parts = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        parts.append(f"{start}:{stop}")
    return ",".join(parts)


def _is_global_sharded(leaf: Any) -> bool:
    import jax

    return isinstance(leaf, jax.Array) and not leaf.is_fully_addressable


def save(path: str, tree: Any, *, step: Optional[int] = None, per_host: bool = True) -> str:
    """Atomically save a pytree checkpoint to directory ``path``.

    Returns the final checkpoint directory. ``step`` is recorded in the
    manifest (latest-step discovery via :func:`latest_step`).
    """
    rank = _process_index()
    if not per_host and rank != 0:
        return path
    import jax

    leaves, treedef = _flatten(tree)
    arrays = {}
    meta = []
    for i, leaf in enumerate(leaves):
        if _is_global_sharded(leaf):
            # per-shard save: this process contributes exactly the shards it
            # can address, deduped by global index (replicated axes make the
            # same slice addressable from several local devices)
            shards = sorted(
                leaf.addressable_shards,
                key=lambda s: _index_key(s.index, leaf.shape),
            )
            shard_keys = []
            seen = set()
            for s in shards:
                key = _index_key(s.index, leaf.shape)
                if key in seen:
                    continue
                seen.add(key)
                arrays[f"leaf_{i}_shard_{len(shard_keys)}"] = np.asarray(s.data)
                shard_keys.append(key)
            meta.append(
                {
                    "index": i,
                    "dtype": str(leaf.dtype),
                    "shape": list(leaf.shape),
                    "sharded": True,
                    "shard_keys": shard_keys,
                }
            )
        else:
            arr = np.asarray(jax.device_get(leaf))
            arrays[f"leaf_{i}"] = arr
            meta.append({"index": i, "dtype": str(arr.dtype), "shape": list(arr.shape)})

    name = path if step is None else os.path.join(path, f"step_{step:08d}")
    suffix = f".rank{rank}" if (per_host and rank > 0) else ""
    final = name + suffix

    parent = os.path.dirname(os.path.abspath(final)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=".ckpt_tmp_", dir=parent)
    try:
        np.savez(os.path.join(tmp, "arrays.npz"), **arrays)
        manifest = {
            "treedef": str(treedef),
            "num_leaves": len(leaves),
            "leaves": meta,
            "step": step,
            "rank": rank,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return final


def restore(path: str, like: Any, *, step: Optional[int] = None) -> Any:
    """Restore a pytree checkpoint, using ``like`` for structure and dtypes.

    Leaves come back as numpy arrays cast to the corresponding ``like`` leaf's
    dtype (callers re-shard / re-device as needed — device placement is not
    checkpoint state).
    """
    import jax

    rank = _process_index()
    name = path if step is None else os.path.join(path, f"step_{step:08d}")
    candidate = name + (f".rank{rank}" if rank > 0 else "")
    final = candidate if os.path.isdir(candidate) else name

    with open(os.path.join(final, "manifest.json")) as fh:
        manifest = json.load(fh)
    data = np.load(os.path.join(final, "arrays.npz"))

    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if manifest["num_leaves"] != len(like_leaves):
        raise ValueError(
            f"checkpoint has {manifest['num_leaves']} leaves, "
            f"'like' pytree has {len(like_leaves)}"
        )
    leaves = []
    for i, like_leaf in enumerate(like_leaves):
        entry = manifest["leaves"][i]
        dtype = getattr(like_leaf, "dtype", None)
        if entry.get("sharded"):
            shape = tuple(entry["shape"])
            local = {
                key: data[f"leaf_{i}_shard_{j}"]
                for j, key in enumerate(entry["shard_keys"])
            }
            if isinstance(like_leaf, jax.Array) and not like_leaf.is_fully_addressable:
                # rebuild the global array: each process serves exactly the
                # shard slices it saved (same topology contract)
                def cb(index, _local=local, _shape=shape, _dt=dtype):
                    return _local[_index_key(index, _shape)].astype(_dt)

                leaves.append(
                    jax.make_array_from_callback(shape, like_leaf.sharding, cb)
                )
                continue
            # single-process restore of a sharded save: assemble densely
            # (only possible if this rank's file covers the whole array)
            out = np.zeros(shape, dtype=entry["dtype"])
            covered = np.zeros(shape, dtype=bool)
            for key, block in local.items():
                slices = tuple(
                    slice(int(a), int(b))
                    for a, b in (part.split(":") for part in key.split(","))
                )
                out[slices] = block
                covered[slices] = True
            if not covered.all():
                raise ValueError(
                    f"leaf {i}: this rank's checkpoint holds only part of the "
                    "sharded array; restore with a 'like' pytree carrying the "
                    "original global sharding"
                )
            leaves.append(out.astype(dtype) if dtype is not None else out)
            continue
        arr = data[f"leaf_{i}"]
        if dtype is not None:
            arr = arr.astype(dtype)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_step(path: str) -> Optional[int]:
    """Highest ``step_XXXXXXXX`` checkpoint under ``path``, or None."""
    if not os.path.isdir(path):
        return None
    steps = []
    for entry in os.listdir(path):
        base = entry.split(".rank")[0]
        if base.startswith("step_"):
            try:
                steps.append(int(base[len("step_"):]))
            except ValueError:
                pass
    return max(steps) if steps else None


def save_dataset_cache(path: str, **arrays: np.ndarray) -> None:
    """The reference's .npy dataset caching, upgraded to one atomic npz.

    [ref: GP_multi_classification.py:209-210 (np.save of X, y)]
    """
    parent = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".npz", dir=parent)
    os.close(fd)
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise


def load_dataset_cache(path: str) -> Optional[Dict[str, np.ndarray]]:
    """[ref: GP_multi_classification.py:215-220 (np.load with existence check)]"""
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        return {k: data[k] for k in data.files}
