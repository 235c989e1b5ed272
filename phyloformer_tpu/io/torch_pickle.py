"""Pure-Python reader for PyTorch zip-format checkpoints (no torch import).

The reference ships five Lightning checkpoints (``models/*.ckpt``,
`/root/reference/README.md:67-72`) that the new framework must ingest
(`/root/reference/infer_alns.py:71-82` is the consuming code path).  A torch
``.ckpt``/``.pt`` file is a zip archive:

    <stem>/data.pkl      pickle of the object graph; tensors are pickled as
                         persistent-id references to flat storages
    <stem>/data/<key>    raw little-endian storage bytes, one file per storage
    <stem>/byteorder     "little" (optional)

The pickle uses three externals (verified on all five reference checkpoints):
``collections.OrderedDict``, ``torch.FloatStorage``, and
``torch._utils._rebuild_tensor_v2``.  We resolve tensors to numpy arrays.
Unknown classes degrade to inert stubs so metadata-rich checkpoints still load.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict, Tuple

import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": np.dtype("<u2"),  # raw bits; caller may view via ml_dtypes
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}


class _StorageType:
    """Marker for ``torch.<X>Storage`` classes appearing in persistent ids."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES.get(name)
        if self.dtype is None:
            raise ValueError(f"unsupported torch storage type: {name}")


class _Stub:
    """Inert stand-in for unknown pickled classes (e.g. Lightning helpers)."""

    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs
        self.state: Any = None

    def __setstate__(self, state):
        self.state = state

    def __repr__(self):  # pragma: no cover
        return f"_Stub(state={self.state!r})"


def _make_stub_class(module: str, name: str):
    cls = type(f"Stub_{name}", (_Stub,), {"__module__": module})
    # dict-like classes (AttributeDict etc.) often pickle via dict protocol
    return cls


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, metadata=None) -> np.ndarray:
    arr, dtype = storage
    itemsize = dtype.itemsize
    if not size:
        return arr[storage_offset : storage_offset + 1].reshape(()).copy()
    strides_bytes = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=strides_bytes, writeable=False
    )
    return np.ascontiguousarray(view)


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, loader):
        super().__init__(file)
        self._loader = loader

    def find_class(self, module: str, name: str):
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return lambda data, requires_grad, hooks: data
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch" and name == "device":
            return str
        if module in ("builtins", "__builtin__"):
            return super().find_class(module, name)
        # Anything else (Lightning callback/metadata classes): inert stub.
        return _make_stub_class(module, name)

    def persistent_load(self, pid: Tuple):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id kind: {kind!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = storage_type.dtype
        raw = self._loader(str(key))
        arr = np.frombuffer(raw, dtype=dtype, count=numel)
        return (arr, dtype)


def load_torch_checkpoint(path) -> Dict[str, Any]:
    """Load a PyTorch zip checkpoint into Python objects with numpy tensors."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_names = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl_names:
            raise ValueError(f"{path}: not a torch zip checkpoint (no data.pkl)")
        pkl_name = pkl_names[0]
        prefix = pkl_name[: -len("data.pkl")]

        byteorder_name = prefix + "byteorder"
        if byteorder_name in names:
            order = zf.read(byteorder_name).decode().strip()
            if order != "little":
                raise ValueError(f"unsupported byte order: {order}")

        def loader(key: str) -> bytes:
            return zf.read(f"{prefix}data/{key}")

        with zf.open(pkl_name) as fh:
            return _TorchUnpickler(io.BytesIO(fh.read()), loader).load()


def load_reference_checkpoint(path) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Load a reference Phyloformer Lightning checkpoint.

    Returns ``(state_dict, hyper_parameters)`` where state-dict keys keep their
    ``model.`` prefix (reference consuming code strips it,
    `/root/reference/infer_alns.py:75-82`).
    """
    obj = load_torch_checkpoint(path)
    if "state_dict" not in obj:
        raise ValueError(f"{path}: no state_dict (not a Phyloformer checkpoint?)")
    state = {k: np.asarray(v) for k, v in obj["state_dict"].items()}
    hparams = dict(obj.get("hyper_parameters", {}) or {})
    return state, hparams


# ---------------------------------------------------------------------------
# Writer: produce torch zip checkpoints without importing torch
# ---------------------------------------------------------------------------
#
# The inverse of the reader above, for interop the other way: checkpoints we
# train on TPU can be handed back to the reference PyTorch tooling
# (`torch.load` at `/root/reference/infer_alns.py:71`).  A custom pure-Python
# pickler emits ``GLOBAL torch.FloatStorage`` / ``torch._utils.
# _rebuild_tensor_v2`` opcodes through inert stand-ins, so writing needs no
# torch import (torch and JAX deadlock in one process here — see
# docs/ROADMAP.md gotchas).  Content stays inside torch's
# ``weights_only=True`` allowlist (tensors, dicts, OrderedDict, scalars).

_NUMPY_TO_STORAGE = {
    np.dtype("<f4"): "FloatStorage",
    np.dtype("<f8"): "DoubleStorage",
    np.dtype("<f2"): "HalfStorage",
    np.dtype("<i8"): "LongStorage",
    np.dtype("<i4"): "IntStorage",
    np.dtype("<i2"): "ShortStorage",
    np.dtype("<i1"): "CharStorage",
    np.dtype("<u1"): "ByteStorage",
    np.dtype("?"): "BoolStorage",
}


def _torch_global(module: str, name: str):
    """A callable/class stand-in that pickles as ``GLOBAL module name``."""

    def fn(*args, **kwargs):  # pragma: no cover - never called at write time
        raise RuntimeError("write-time stand-in")

    fn._torch_global = (module, name)
    fn.__qualname__ = name
    return fn


_REBUILD_STANDIN = _torch_global("torch._utils", "_rebuild_tensor_v2")
_STORAGE_STANDINS = {
    name: _torch_global("torch", name) for name in _NUMPY_TO_STORAGE.values()
}


class _PendingStorage:
    """Marker routed through persistent_id; collects raw storage bytes."""

    def __init__(self, arr: np.ndarray, storage_name: str):
        self.arr = arr
        self.storage_name = storage_name


class _TorchPickler(pickle._Pickler):
    """Pickler that understands numpy arrays as torch tensors."""

    def __init__(self, file, protocol=2):
        super().__init__(file, protocol)
        self.storages: Dict[str, bytes] = {}

    def save_global(self, obj, name=None):
        fq = getattr(obj, "_torch_global", None)
        if fq is not None:
            self.write(pickle.GLOBAL + f"{fq[0]}\n{fq[1]}\n".encode("ascii"))
            self.memoize(obj)
            return
        return super().save_global(obj, name)

    dispatch = dict(pickle._Pickler.dispatch)
    # route function stand-ins through OUR save_global (the inherited
    # dispatch table binds the parent's)
    import types as _types

    dispatch[_types.FunctionType] = save_global

    def _save_ndarray(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        dtype = arr.dtype.newbyteorder("<")
        storage_name = _NUMPY_TO_STORAGE.get(dtype)
        if storage_name is None:
            raise ValueError(f"unsupported tensor dtype for torch export: {arr.dtype}")
        shape = tuple(int(s) for s in arr.shape)
        # contiguous element strides, torch convention
        strides, acc = [], 1
        for s in reversed(shape):
            strides.append(acc)
            acc *= s
        strides = tuple(reversed(strides))
        import collections

        rv = (
            _REBUILD_STANDIN,
            (
                _PendingStorage(arr.astype(dtype, copy=False), storage_name),
                0,
                shape,
                strides,
                False,
                collections.OrderedDict(),
            ),
        )
        self.save_reduce(*rv, obj=arr)

    dispatch[np.ndarray] = _save_ndarray

    def persistent_id(self, obj):
        if isinstance(obj, _PendingStorage):
            key = str(len(self.storages))
            self.storages[key] = obj.arr.tobytes()
            return ("storage", _STORAGE_STANDINS[obj.storage_name], key, "cpu",
                    int(obj.arr.size))
        return None


def save_torch_checkpoint(path, obj: Any, prefix: str = "archive") -> None:
    """Write ``obj`` (numpy arrays become torch tensors) as a torch zip
    checkpoint readable by ``torch.load`` (incl. ``weights_only=True``)."""
    buf = io.BytesIO()
    pickler = _TorchPickler(buf, protocol=2)
    pickler.dump(obj)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{prefix}/data.pkl", buf.getvalue())
        for key, raw in pickler.storages.items():
            zf.writestr(f"{prefix}/data/{key}", raw)
        zf.writestr(f"{prefix}/version", "3\n")
        zf.writestr(f"{prefix}/byteorder", "little")
