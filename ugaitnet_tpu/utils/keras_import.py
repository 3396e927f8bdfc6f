"""Import reference-trained Keras weight files into UGaitNet params.

Migration path for users with models trained by the original repo (h5
checkpoints from model.save_weights / model.save,
/root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:524-527): reads
the HDF5 weight layout directly (h5py, no TensorFlow needed) and maps layers
into our parameter tree.

Supported: the gaitset 2-mod family (flagship). Layer mapping follows the
reference build order (verified by tests/test_reference_parity.py):
TimeDistributed convs 1..6 = frame-stream a_conv1..6, plain Conv2D 1..4 =
set-stream b_conv1..4, MatMul = part_proj — first half of each group is
branch 1 ("of"), second half branch 2; classprob Dense maps directly (the
flatten orders agree: both are (part, dim) per sample).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _collect_weights(h5path: str) -> Dict[str, List[np.ndarray]]:
    """layer name -> [weight arrays] from a Keras h5 weights file."""
    import h5py
    out: Dict[str, List[np.ndarray]] = {}
    with h5py.File(h5path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        names = [n.decode() if isinstance(n, bytes) else n
                 for n in root.attrs.get("layer_names", list(root.keys()))]
        for lname in names:
            if lname not in root:
                continue
            g = f"{lname}" if lname in root else None
            grp = root[lname]
            wnames = [n.decode() if isinstance(n, bytes) else n
                      for n in grp.attrs.get("weight_names", [])]
            ws = []
            for wn in wnames:
                node = grp
                for part in wn.split("/"):
                    node = node[part]
                ws.append(np.asarray(node))
            if not ws:  # fallback: walk datasets
                def visit(name, obj):
                    if hasattr(obj, "shape") and obj.shape is not None:
                        ws.append(np.asarray(obj))
                grp.visititems(lambda n, o: visit(n, o)
                               if hasattr(o, "dtype") else None)
            if ws:
                out[lname] = ws
    return out


def _suffix(name: str, prefix: str) -> int:
    return int(name[len(prefix):].lstrip("_") or 0)


def load_gaitset_2mod_weights(h5path: str, params: Any) -> Any:
    """Fill a flagship 2-mod gaitset params tree from a reference h5 file.

    params: the tree from init_params (mutated copy returned). Raises if the
    expected layer counts aren't found.
    """
    weights = _collect_weights(h5path)
    tds = sorted([n for n in weights if n.startswith("time_distributed")],
                 key=lambda n: _suffix(n, "time_distributed"))
    convs = sorted([n for n in weights if n.startswith("conv2d")],
                   key=lambda n: _suffix(n, "conv2d"))
    mms = sorted([n for n in weights if n.startswith("mat_mul")],
                 key=lambda n: _suffix(n, "mat_mul"))
    if len(tds) != 12 or len(convs) != 8 or len(mms) != 2:
        raise ValueError(
            f"not a 2-mod gaitset checkpoint: {len(tds)} TimeDistributed, "
            f"{len(convs)} Conv2D, {len(mms)} MatMul layers")

    import jax.numpy as jnp
    p = params["params"] if "params" in params else params

    def fill(branch: Dict, td6, conv4, mm):
        for i, n in enumerate(td6, 1):
            branch[f"a_conv{i}"]["kernel"] = jnp.asarray(weights[n][0])
        for i, n in enumerate(conv4, 1):
            branch[f"b_conv{i}"]["kernel"] = jnp.asarray(weights[n][0])
        branch["part_proj"] = jnp.asarray(weights[mm][0])

    branches = [k for k in p if k.startswith("branch_")]
    if len(branches) != 2:
        raise ValueError(f"params tree has branches {branches}, expected 2")
    # reference creation order: branch built from ofinput first
    order = sorted(branches, key=lambda b: 0 if b == "branch_of" else 1)
    fill(p[order[0]], tds[:6], convs[:4], mms[0])
    fill(p[order[1]], tds[6:], convs[4:], mms[1])

    if "classprob" in p and "classprob" in weights:
        k, b = weights["classprob"][:2]
        if p["classprob"]["kernel"].shape == k.shape:
            p["classprob"]["kernel"] = jnp.asarray(k)
            p["classprob"]["bias"] = jnp.asarray(b)
    return params
