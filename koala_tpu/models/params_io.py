"""Model parameter file format (save/load).

Our analog of the reference's ``lib/common/koala_params.pv`` weights blob
(magic "koala3.0.0", ~4 MB; SURVEY.md §2 #2). Ours is an .npz container:

- key ``__meta__``: uint8 bytes of a JSON header {magic, version, config}
- tensor keys: flattened pytree paths, stored float16 (halves file size,
  matching the reference's ~2-bytes/param budget), loaded back as float32.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from .._version import __version__
from ..constants import MODEL_MAGIC
from ..errors import ERROR_STACK, KoalaIOError, raise_with_stack


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params, config: Dict[str, Any]) -> None:
    # Persist the FULL resolved config: a model file must carry every
    # feature switch explicitly so later DEFAULT_CONFIG changes can never
    # reinterpret it (round-3 regression: back-filled defaults broke every
    # committed .pv; reference bar: versioned koala_params.pv, SURVEY §2 #2).
    if (config or {}).get("kind", "mask_gru") == "mask_gru":
        from . import mask_gru
        config = mask_gru.normalize_config(config, params)
    flat = _flatten(params)
    meta = json.dumps({
        "magic": MODEL_MAGIC.decode("ascii", "replace").rstrip("\x00"),
        "version": __version__,
        "config": config,
    }).encode("utf-8")
    arrays = {"__meta__": np.frombuffer(meta, dtype=np.uint8)}
    for k, v in flat.items():
        v = np.asarray(v)
        arrays[k] = v.astype(np.float16) if v.dtype == np.float32 else v
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_params(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load a model file -> (params pytree float32, config dict)."""
    if not os.path.exists(path):
        ERROR_STACK.push("could not find model file at `%s`" % path)
        raise_with_stack(KoalaIOError, "IO error")
    try:
        with np.load(path, allow_pickle=False) as data:
            if "__meta__" not in data:
                raise ValueError("missing __meta__ header")
            meta = json.loads(bytes(data["__meta__"].tobytes()).decode("utf-8"))
            expected_magic = MODEL_MAGIC.decode("ascii", "replace").rstrip("\x00")
            if meta.get("magic") != expected_magic:
                raise ValueError("bad magic %r" % meta.get("magic"))
            flat = {}
            for k in data.files:
                if k == "__meta__":
                    continue
                v = data[k]
                flat[k] = v.astype(np.float32) if v.dtype == np.float16 else v
    except (ValueError, OSError, KeyError, json.JSONDecodeError) as e:
        ERROR_STACK.push("failed to parse model file `%s`: %s" % (path, e))
        ERROR_STACK.push("model load failed")
        raise_with_stack(KoalaIOError, "Invalid model file")
    params, config = _unflatten(flat), meta["config"]
    if (config or {}).get("kind", "mask_gru") == "mask_gru":
        # Compatibility guard: resolve the config fully and reconcile its
        # feature switches with the actual encoder weight shape (legacy
        # files predate some switches; the weights are the ground truth).
        from . import mask_gru
        try:
            config = mask_gru.normalize_config(config, params)
        except (ValueError, KeyError, TypeError) as e:
            ERROR_STACK.push("incompatible model file `%s`: %s" % (path, e))
            raise_with_stack(KoalaIOError, "Invalid model file")
    return params, config


def default_model_path() -> str:
    """Path of the bundled trained model (analog of default_model_path in
    reference binding/python/_util.py:83-84)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(here), "models", "koala_params_tpu.pv")


__all__ = ["save_params", "load_params", "default_model_path"]
