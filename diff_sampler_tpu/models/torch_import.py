"""Import PyTorch checkpoints into Flax parameter pytrees.

Needed for FID parity with the reference's pre-trained weights (SURVEY.md
section 7: EDM pkl `sample.py:82`, CM pt `cm_model_loader.py:120-127`, ADM pt
`cg_model_loader.py:145-160`, LDM/SD state_dict `sample.py:58-72`).

The module/parameter names of our Flax U-Nets mirror the torch state_dict
('enc.8x8_block0.conv0' -> 'enc_8x8_block0'/'conv0'), so the rewrite is
mechanical:
  * 4-D conv weights: OIHW -> HWIO
  * 2-D linear weights: (out, in) -> (in, out)
  * 1-D norm weights: 'weight' -> 'scale'
  * 'resample_filter' buffers are dropped (recomputed from config)

Security note: the reference's EDM .pkl snapshots embed class source code via
`torch_utils/persistence.py` and execute it on unpickle.  `load_edm_pkl`
therefore uses a restricted unpickler that reconstructs ONLY tensors and
plain containers -- no embedded code runs.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict, Mapping, Tuple

import numpy as np

__all__ = ["state_dict_to_params", "load_torch_file", "torch_state_dict"]

_MERGE_PARENTS = ("enc", "dec")


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor without importing torch at module scope
    return v.detach().cpu().numpy()


def state_dict_to_params(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a flat torch state_dict into a nested Flax params dict."""
    params: Dict[str, Any] = {}
    for key, val in state_dict.items():
        arr = _to_numpy(val)
        parts = key.split(".")
        if parts[-1] == "resample_filter":
            continue
        # merge 'enc'/'dec' with the following layer name
        merged = []
        i = 0
        while i < len(parts):
            if parts[i] in _MERGE_PARENTS and i + 1 < len(parts):
                merged.append(f"{parts[i]}_{parts[i+1]}")
                i += 2
            else:
                merged.append(parts[i])
                i += 1
        leaf = merged[-1]
        path = merged[:-1]
        if leaf == "weight":
            if arr.ndim == 4:
                leaf, arr = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                leaf, arr = "kernel", arr.T
            elif arr.ndim == 1:
                leaf = "scale"
            else:
                raise ValueError(f"unexpected weight rank for {key}: {arr.shape}")
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = np.ascontiguousarray(arr, dtype=np.float32)
    return params


# ---------------------------------------------------------------------------
# Restricted torch-file loading (no arbitrary code execution)
# ---------------------------------------------------------------------------


class _TensorStub:
    """Minimal stand-in reconstructed from torch's persistent storage refs."""

    def __init__(self, storage, storage_offset, size, stride):
        self.storage = storage
        self.size = tuple(size)
        self.stride = tuple(stride)
        self.storage_offset = storage_offset

    def to_numpy(self) -> np.ndarray:
        arr = self.storage
        if not self.size:
            return arr[self.storage_offset].copy()
        return np.lib.stride_tricks.as_strided(
            arr[self.storage_offset:],
            shape=self.size,
            strides=tuple(s * arr.itemsize for s in self.stride),
        ).copy()


_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially
}


def _bf16_to_f32(raw: bytes) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    return (u16.astype(np.uint32) << 16).view(np.float32)


class _DictStub(dict):
    """OrderedDict stand-in that absorbs instance state (e.g. torch's
    state_dict._metadata) set via pickle BUILD."""

    def __setstate__(self, state):
        pass


class _ObjStub:
    """Inert reconstruction target for arbitrary pickled classes.

    Instances may be built via __init__ (REDUCE) or bare __new__ + BUILD
    (NEWOBJ), so attribute defaults live on the class."""

    _qualname = "?"
    args = ()
    kwargs: dict = {}
    state: dict = {}

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs

    def __setstate__(self, state):
        self.state = state if isinstance(state, dict) else {"__state__": state}

    # some reducers use __dict__.update via BUILD with a dict -> handled by
    # __setstate__; slots-state tuples land in __state__.


_STUB_CACHE = {}


def _make_stub(module: str, name: str):
    key = f"{module}.{name}"
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(name, (_ObjStub,), {"_qualname": key})
    return _STUB_CACHE[key]


class _SafeUnpickler(pickle.Unpickler):
    """Reconstructs tensors + plain containers from a torch zip checkpoint.

    Anything class-like (including persistence-embedded sources) becomes an
    inert dict stub -- no code from the checkpoint ever executes.
    """

    def __init__(self, f, zf: zipfile.ZipFile, archive_root: str):
        super().__init__(f)
        self._zf = zf
        self._root = archive_root

    def persistent_load(self, pid):
        typename, storage_type, key, _location, numel = pid[:5] if len(pid) >= 5 else (
            pid[0], pid[1], pid[2], pid[3], None)
        assert typename == "storage", f"unexpected persistent id {pid!r}"
        name = getattr(storage_type, "__name__", str(storage_type))
        raw = self._zf.read(f"{self._root}/data/{key}")
        if "BFloat16" in name:
            return _bf16_to_f32(raw)
        dtype = None
        for k, v in _DTYPES.items():
            if k in name:
                dtype = v
                break
        if dtype is None:
            dtype = np.float32
        return np.frombuffer(raw, dtype=dtype)

    def find_class(self, module, name):
        if module == "collections" and name == "OrderedDict":
            return _DictStub
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            def rebuild(storage, offset, size, stride, *_a, **_k):
                return _TensorStub(storage, offset, size, stride)
            return rebuild
        if (module, name) == ("torch._utils", "_rebuild_parameter"):
            def rebuild_param(tensor, *_a, **_k):
                return tensor
            return rebuild_param
        if module.startswith("torch") and "Storage" in name:
            return type(name, (), {"__name__": name})
        # Inert stub CLASS for anything else (persistence-wrapped modules,
        # nn.Module subclasses, EasyDict, ...): reconstructible by pickle
        # (accepts any args, absorbs setstate into .state) but carries no
        # behavior -- embedded source never executes.
        return _make_stub(module, name)


def _parse_legacy_storage_bytes(b: bytes) -> np.ndarray:
    """Parse the payload of torch.storage._load_from_bytes: a legacy
    torch.save stream holding ONE storage (magic/protocol/sysinfo pickles,
    a storage-ref pickle, the key list pickle, then `i64 count` + raw data).

    Plain (non-zip) pickles of torch modules -- e.g. the NVIDIA Inception
    detector pkl (`diff-solvers-main/fid.py:34`) -- serialize every tensor's
    storage this way."""
    f = io.BytesIO(bytes(b))
    for _ in range(3):  # magic number, protocol version, sys info
        pickle.load(f)

    info: Dict[str, Any] = {}

    class _StorageRef(pickle.Unpickler):
        def persistent_load(self, pid):
            assert pid[0] == "storage", f"unexpected pid {pid!r}"
            info["type"] = getattr(pid[1], "__name__", str(pid[1]))
            return None

        def find_class(self, module, name):
            return type(name, (), {"__name__": name})

    _StorageRef(f).load()
    keys = pickle.load(f)
    assert len(keys) == 1, f"expected one storage, got {keys!r}"
    count = int.from_bytes(f.read(8), "little")
    raw = f.read()

    name = info.get("type", "")
    if "BFloat16" in name:
        arr = _bf16_to_f32(raw[: count * 2])
    else:
        dtype = next((v for k, v in _DTYPES.items() if k in name), None)
        if dtype is None:  # UntypedStorage: count is in bytes
            dtype, count = np.uint8, min(count, len(raw))
        arr = np.frombuffer(raw[: count * np.dtype(dtype).itemsize], dtype=dtype)
    return arr


def load_torch_file(path: str) -> Any:
    """Load a torch checkpoint without executing code: either a torch-zip
    .pt/.pth/.pkl archive or a PLAIN pickle of a module (the NVIDIA metric
    pkls, `fid.py:34`).

    Returns the unpickled object with tensors as numpy arrays."""
    if not zipfile.is_zipfile(path):
        with open(path, "rb") as f:
            obj = _SafePlainUnpickler(f).load()
        return _materialize(obj)
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        root = pkl_name[: -len("/data.pkl")]
        with zf.open(pkl_name) as f:
            obj = _SafeUnpickler(io.BytesIO(f.read()), zf, root).load()
    return _materialize(obj)


class _SafePlainUnpickler(pickle.Unpickler):
    """Restricted unpickler for PLAIN pickles of torch objects (storages
    inline via torch.storage._load_from_bytes instead of zip members)."""

    def find_class(self, module, name):
        if module == "collections" and name == "OrderedDict":
            return _DictStub
        if (module, name) == ("torch.storage", "_load_from_bytes"):
            return _parse_legacy_storage_bytes
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            def rebuild(storage, offset, size, stride, *_a, **_k):
                return _TensorStub(storage, offset, size, stride)
            return rebuild
        if (module, name) == ("torch._utils", "_rebuild_parameter"):
            return lambda tensor, *_a, **_k: tensor
        if module == "builtins":
            return {"set": set, "frozenset": frozenset, "list": list,
                    "dict": dict, "tuple": tuple}.get(name, _make_stub(module, name))
        if module.startswith("torch") and "Storage" in name:
            return type(name, (), {"__name__": name})
        return _make_stub(module, name)


def _materialize(obj):
    if isinstance(obj, _TensorStub):
        return obj.to_numpy()
    if isinstance(obj, dict):
        return {k: _materialize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = type(obj)
        return t(_materialize(v) for v in obj)
    if isinstance(obj, _ObjStub):
        obj.args = _materialize(obj.args)
        obj.kwargs = _materialize(obj.kwargs)
        obj.state = _materialize(obj.state)
        return obj
    return obj


def _walk_module_stub(stub, prefix: str, out: Dict[str, np.ndarray]) -> None:
    """Collect _parameters/_buffers from a pickled torch.nn.Module object
    tree (modules pickle their __dict__: _parameters, _buffers, _modules)."""
    state = stub.state if isinstance(stub, _ObjStub) else stub
    if not isinstance(state, dict):
        return
    for group in ("_parameters", "_buffers"):
        for name, val in (state.get(group) or {}).items():
            if isinstance(val, np.ndarray):
                out[f"{prefix}{name}" if not prefix else f"{prefix}.{name}"] = val
    for name, sub in (state.get("_modules") or {}).items():
        sub_prefix = f"{prefix}.{name}" if prefix else str(name)
        _walk_module_stub(sub, sub_prefix, out)


def torch_state_dict(obj) -> Dict[str, np.ndarray]:
    """Extract a flat {name: array} mapping from a loaded checkpoint object.

    Handles: raw state_dicts, {'ema'/'model'/'net'/'state_dict': ...}
    containers, and pickled MODULE OBJECTS (EDM's persistence-wrapped
    snapshots, `diff-solvers-main/sample.py:82`) by walking the module tree's
    _parameters/_buffers."""
    if isinstance(obj, dict) and obj and all(
            isinstance(v, np.ndarray) for v in obj.values()):
        return obj
    if isinstance(obj, _ObjStub):
        # persistence-wrapped object: the real payload may live in
        # state['state'] (persistence meta dict) or directly in state.
        inner = obj.state.get("state") if isinstance(obj.state, dict) else None
        target = inner if isinstance(inner, (dict, _ObjStub)) else obj
        out: Dict[str, np.ndarray] = {}
        _walk_module_stub(target, "", out)
        if out:
            return out
        raise ValueError(f"no tensors found in pickled object {obj._qualname}")
    if isinstance(obj, dict):
        for key in ("ema", "state_dict", "model", "net"):
            if key in obj:
                return torch_state_dict(obj[key])
    raise ValueError("could not locate a state_dict in checkpoint object")
