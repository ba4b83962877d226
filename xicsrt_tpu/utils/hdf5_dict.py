"""Nested dict <-> HDF5 round-trip.

Equivalent of ``xicsrt/util/mirhdf5.py``: arbitrarily nested dicts of
ndarrays / scalars / strings / lists / None round-trip through HDF5 groups,
with python types recorded as attributes.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py

    HAVE_H5PY = True
except ImportError:  # pragma: no cover
    HAVE_H5PY = False


def save(filename: str, data: dict) -> None:
    if not HAVE_H5PY:
        raise ImportError("h5py is required for HDF5 output.")
    with h5py.File(filename, "w") as fh:
        _write_group(fh, data)


def load(filename: str) -> dict:
    if not HAVE_H5PY:
        raise ImportError("h5py is required for HDF5 input.")
    with h5py.File(filename, "r") as fh:
        return _read_group(fh)


def _write_group(group, data: dict) -> None:
    for key, value in data.items():
        key = str(key)
        if isinstance(value, dict):
            sub = group.create_group(key)
            sub.attrs["_pytype"] = "dict"
            _write_group(sub, value)
        elif value is None:
            ds = group.create_dataset(key, data=0)
            ds.attrs["_pytype"] = "none"
        elif isinstance(value, str):
            ds = group.create_dataset(key, data=np.bytes_(value))
            ds.attrs["_pytype"] = "str"
        elif isinstance(value, bool):
            ds = group.create_dataset(key, data=int(value))
            ds.attrs["_pytype"] = "bool"
        elif isinstance(value, (int, float, np.generic)):
            ds = group.create_dataset(key, data=value)
            ds.attrs["_pytype"] = "scalar"
        elif isinstance(value, (list, tuple)):
            arr = np.asarray(value)
            if arr.dtype.kind in "fiub":
                ds = group.create_dataset(key, data=arr)
                ds.attrs["_pytype"] = "list"
            else:
                sub = group.create_group(key)
                sub.attrs["_pytype"] = "strlist"
                for ii, item in enumerate(value):
                    sub.create_dataset(str(ii), data=np.bytes_(str(item)))
        elif isinstance(value, np.ndarray):
            ds = group.create_dataset(key, data=value)
            ds.attrs["_pytype"] = "ndarray"
        else:
            ds = group.create_dataset(key, data=np.asarray(value))
            ds.attrs["_pytype"] = "ndarray"


def _read_group(group) -> dict:
    out = {}
    for key in group:
        item = group[key]
        pytype = item.attrs.get("_pytype", None)
        if hasattr(item, "keys") and not hasattr(item, "shape"):
            if pytype == "strlist":
                out[key] = [
                    item[str(ii)][()].decode() for ii in range(len(item.keys()))
                ]
            else:
                out[key] = _read_group(item)
        else:
            value = item[()]
            if pytype == "none":
                out[key] = None
            elif pytype == "str":
                out[key] = value.decode() if isinstance(value, bytes) else str(value)
            elif pytype == "bool":
                out[key] = bool(value)
            elif pytype == "scalar":
                out[key] = value.item() if hasattr(value, "item") else value
            elif pytype == "list":
                out[key] = np.asarray(value).tolist()
            else:
                out[key] = np.asarray(value)
    return out
