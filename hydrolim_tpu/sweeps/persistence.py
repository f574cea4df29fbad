"""Checkpoint / resume for sweep results (SURVEY.md §5).

Generalizes the reference's coarse-grained run-flag pattern (npz dumps keyed
by hardcoded filenames, `..._sweep_beta.py:933-970`) into config-hash-keyed
checkpoints: a sweep result pytree is stored under a key derived from its
configuration, and :func:`cached_run` transparently reloads instead of
re-simulating when an up-to-date checkpoint exists (the `run=False`
equivalent, without the user tracking filenames).
"""
from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import numpy as np


def config_hash(config: Dict[str, Any]) -> str:
    """Stable short hash of a JSON-serializable config dict (callables and
    arrays are reduced to reprs / lists)."""

    def norm(v):
        if callable(v):
            return getattr(v, "__name__", repr(type(v)))
        if isinstance(v, np.ndarray):
            return v.tolist()
        if isinstance(v, dict):
            return {k: norm(x) for k, x in sorted(v.items())}
        if isinstance(v, (list, tuple)):
            return [norm(x) for x in v]
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
        return v

    blob = json.dumps(norm(config), sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def save_result(result: Dict[str, Any], path: str | Path,
                config: Optional[Dict] = None) -> None:
    """npz dump of a flat result dict (arrays/scalars; nested dicts are
    stored as pickled objects like the reference does for ps_kwargs)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {}
    for k, v in result.items():
        if isinstance(v, (dict, list)) and not isinstance(v, np.ndarray):
            payload[k] = np.asarray(v, dtype=object)
        else:
            payload[k] = np.asarray(v)
    if config is not None:
        payload["__config_hash__"] = np.asarray(config_hash(config))
    np.savez(path, **payload)


def load_result(path: str | Path) -> Dict[str, Any]:
    data = np.load(path, allow_pickle=True)
    out = {}
    for k in data.files:
        v = data[k]
        out[k] = v.item() if v.dtype == object and v.ndim == 0 else v
    return out


def cached_run(fn: Callable[[], Dict[str, Any]], *, config: Dict,
               cache_dir: str | Path = "hydrolim_cache",
               tag: str = "sweep", force: bool = False) -> Dict[str, Any]:
    """Run ``fn`` (an expensive sweep) unless a checkpoint with the same
    config hash exists; the reference's ``run=True/False`` flag made
    automatic."""
    cache_dir = Path(cache_dir)
    key = config_hash(config)
    path = cache_dir / f"{tag}_{key}.npz"
    if path.exists() and not force:
        out = load_result(path)
        if str(out.get("__config_hash__", "")) == key:
            return out
    result = fn()
    save_result(result, path, config=config)
    result["__config_hash__"] = key
    return result


# ---------------------------------------------------------------------------
# orbax pytree checkpoints (SURVEY.md §5: "serialize sweep-result pytrees
# (orbax or npz)") — for arbitrarily nested JAX pytrees; npz stays the
# default for flat result dicts.
# ---------------------------------------------------------------------------

def save_pytree(tree, path: str | Path) -> None:
    """Orbax checkpoint of a JAX pytree (nested dicts/arrays)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree)


def load_pytree(path: str | Path):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute())
