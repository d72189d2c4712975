"""Import released PyTorch Timbre-Trap weights into the flax parameter tree.

Handles the reference module naming scheme (``timbre_trap/framework/
modules.py``): ``encoder.convin.0.weight`` etc., with the layout
conversions

* Conv2d weight           (out, in, kh, kw) -> (kh, kw, in, out)
* ConvTranspose2d weight  (in, out, kh, kw) -> (kh, kw, in, out)
* Linear (FiLM) weight    (out, in)         -> (in, out)

so that ``tt-orig.pt`` (and any checkpoint of the reference families) can
run on TPU. Verified functionally against the reference modules in
``tests/test_interop.py``.
"""

import numpy as np

__all__ = ["import_torch_state_dict", "export_torch_state_dict",
           "load_torch_checkpoint"]

# Parameter paths that are transposed convolutions in the reference.
_TRANSPOSE_CONV_PATHS = ("decoder.convin",)
_LINEAR_PATHS = ("film_layer.gamma", "film_layer.beta")


def _to_numpy(value):
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return np.asarray(value)


def _assign(tree, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def import_torch_state_dict(state_dict, reference_params=None):
    """Convert a reference torch ``state_dict`` into a flax param tree.

    If ``reference_params`` (the tree from ``net.init``) is given, shapes
    are validated against it and missing/extra keys raise.
    """
    params = {}
    for name, value in state_dict.items():
        value = _to_numpy(value)
        parts = [p for p in name.split(".") if p != "0"]  # drop Sequential idx
        if parts[-1] not in ("weight", "bias"):
            continue
        leaf = "bias" if parts[-1] == "bias" else "kernel"
        clean = ".".join(parts[:-1])

        if parts == ["skip_weights"] or name == "skip_weights":
            params["skip_weights"] = value
            continue

        if leaf == "kernel":
            is_tconv = (clean in _TRANSPOSE_CONV_PATHS
                        or clean.endswith(".tconv"))
            is_linear = clean in _LINEAR_PATHS
            if is_linear:
                value = value.T  # (out, in) -> (in, out)
            elif is_tconv:
                value = value.transpose(2, 3, 0, 1)  # (in,out,kh,kw)->(kh,kw,in,out)
            elif value.ndim == 4:
                value = value.transpose(2, 3, 1, 0)  # (out,in,kh,kw)->(kh,kw,in,out)
        _assign(params, parts[:-1] + [leaf], value)

    # skip_weights is stored flat in the torch module
    if "skip_weights" in state_dict:
        params["skip_weights"] = _to_numpy(state_dict["skip_weights"])

    if reference_params is not None:
        _validate(params, reference_params)
    return params


def _flatten(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            out.update(_flatten(value, prefix + (key,)))
        else:
            out[prefix + (key,)] = value
    return out


def _validate(params, reference_params):
    got = _flatten(params)
    want = _flatten(reference_params)
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    if missing or extra:
        raise ValueError(f"parameter mismatch: missing={sorted(missing)} "
                         f"extra={sorted(extra)}")
    for key in want:
        if tuple(np.shape(got[key])) != tuple(np.shape(want[key])):
            raise ValueError(
                f"shape mismatch at {'.'.join(key)}: "
                f"{np.shape(got[key])} vs {np.shape(want[key])}")


def export_torch_state_dict(params, like=None):
    """Inverse of :func:`import_torch_state_dict`.

    Converts a flax parameter tree back into a reference-named torch-layout
    ``state_dict`` (numpy values) so checkpoints trained here can be loaded
    by the reference ``load_state_dict`` (``timbre_trap/framework/
    modules.py`` naming). Exact inverse:
    ``import_torch_state_dict(export_torch_state_dict(p)) == p``.

    ``like`` — optional iterable of the target torch module's state_dict
    keys (e.g. ``ref_model.state_dict().keys()``). The reference wraps convs
    in ``nn.Sequential`` so its keys carry ``.0`` segments
    (``encoder.convin.0.weight``) that the importer drops; with ``like``
    given, exported keys are renamed to the matching original so the dict
    loads into the torch module verbatim.
    """
    state_dict = {}
    for path, value in sorted(_flatten(params).items()):
        value = np.asarray(value)
        if path == ("skip_weights",):
            state_dict["skip_weights"] = value
            continue
        clean = ".".join(path[:-1])
        if path[-1] == "kernel":
            if clean in _LINEAR_PATHS:
                value = value.T                       # (in,out) -> (out,in)
            elif clean in _TRANSPOSE_CONV_PATHS or clean.endswith(".tconv"):
                value = value.transpose(2, 3, 0, 1)   # (kh,kw,in,out)->(in,out,kh,kw)
            elif value.ndim == 4:
                value = value.transpose(3, 2, 0, 1)   # (kh,kw,in,out)->(out,in,kh,kw)
            state_dict[f"{clean}.weight"] = value
        else:
            state_dict[f"{clean}.{path[-1]}"] = value

    if like is not None:
        rename = {".".join(p for p in key.split(".") if p != "0"): key
                  for key in like}
        unknown = set(state_dict) - set(rename)
        if unknown:
            raise ValueError(f"no target key for {sorted(unknown)}")
        state_dict = {rename[k]: v for k, v in state_dict.items()}
    return state_dict


def load_torch_checkpoint(path):
    """Load a ``.pt`` file and return its state_dict (numpy values).

    Supports both ``torch.save(model.state_dict())`` and whole-module saves
    (``torch.save(model)``, used by the reference trainer) — the latter
    requires the pickled class to be importable.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _to_numpy(v) for k, v in obj.items()}
