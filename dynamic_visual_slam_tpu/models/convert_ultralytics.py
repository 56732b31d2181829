"""Import ultralytics YOLOv8 .pt weights into the JAX parameter pytree.

The reference deploys pretrained ultralytics YOLOv8 (README.md:87-104); this
converter maps its torch state dict onto models/yolov8.init_params layout,
folding every BatchNorm into the preceding conv:

    w' = w * gamma / sqrt(var + eps)        b' = beta - mean * gamma / sqrt(var + eps)

Usage (offline, host-side):
    params = convert("yolov8n.pt")
    save_params(params, "yolov8n.msgpack.npz")
Runtime loads the .npz; torch is only needed for the one-time conversion.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# ultralytics model.model module index → our param tree path
_BACKBONE = [
    ("0", "stem"), ("1", "down1"), ("2", "c2f1"), ("3", "down2"),
    ("4", "c2f2"), ("5", "down3"), ("6", "c2f3"), ("7", "down4"),
    ("8", "c2f4"), ("9", "sppf"),
    ("12", "up_c2f1"), ("15", "up_c2f2"),
    ("16", "down_conv1"), ("18", "down_c2f1"),
    ("19", "down_conv2"), ("21", "down_c2f2"),
]


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Conv+BN at `prefix` (ultralytics Conv module) → fused w (HWIO), b."""
    w = sd[f"{prefix}.conv.weight"]            # (O, I, kh, kw) torch layout
    gamma = sd[f"{prefix}.bn.weight"]
    beta = sd[f"{prefix}.bn.bias"]
    mean = sd[f"{prefix}.bn.running_mean"]
    var = sd[f"{prefix}.bn.running_var"]
    eps = 1e-3
    scale = gamma / np.sqrt(var + eps)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    return dict(w=w.transpose(2, 3, 1, 0).astype(np.float32),   # HWIO
                b=b.astype(np.float32))


def _plain_conv(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]
    b = sd.get(f"{prefix}.bias", np.zeros(w.shape[0], np.float32))
    return dict(w=w.transpose(2, 3, 1, 0).astype(np.float32),
                b=b.astype(np.float32))


def _c2f(sd, prefix):
    out = dict(cv1=_fold_bn(sd, f"{prefix}.cv1"),
               cv2=_fold_bn(sd, f"{prefix}.cv2"), m=[])
    i = 0
    while f"{prefix}.m.{i}.cv1.conv.weight" in sd:
        out["m"].append(dict(cv1=_fold_bn(sd, f"{prefix}.m.{i}.cv1"),
                             cv2=_fold_bn(sd, f"{prefix}.m.{i}.cv2")))
        i += 1
    return out


def convert(pt_path: str) -> Dict[str, Any]:
    """ultralytics yolov8*.pt → our parameter pytree (numpy arrays)."""
    import torch  # noqa: deferred heavy import

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    root = "model"

    params: Dict[str, Any] = {}
    for idx, name in _BACKBONE:
        prefix = f"{root}.{idx}"
        if name.startswith(("c2f", "up_c2f", "down_c2f")):
            params[name] = _c2f(sd, prefix)
        elif name == "sppf":
            params[name] = dict(cv1=_fold_bn(sd, f"{prefix}.cv1"),
                                cv2=_fold_bn(sd, f"{prefix}.cv2"))
        else:
            params[name] = _fold_bn(sd, prefix)

    heads = []
    det = f"{root}.22"
    for s in range(3):
        heads.append(dict(
            box1=_fold_bn(sd, f"{det}.cv2.{s}.0"),
            box2=_fold_bn(sd, f"{det}.cv2.{s}.1"),
            box3=_plain_conv(sd, f"{det}.cv2.{s}.2"),
            cls1=_fold_bn(sd, f"{det}.cv3.{s}.0"),
            cls2=_fold_bn(sd, f"{det}.cv3.{s}.1"),
            cls3=_plain_conv(sd, f"{det}.cv3.{s}.2")))
    params["heads"] = heads
    params["num_classes"] = heads[0]["cls3"]["w"].shape[-1]
    return _to_bf16(params)


def _to_bf16(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _to_bf16(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_bf16(v) for v in tree]
    if isinstance(tree, np.ndarray):
        return jnp.asarray(tree, jnp.bfloat16)
    return tree


def save_params(params: Dict[str, Any], path: str) -> None:
    """Flatten to an .npz (path-keyed) for dependency-free runtime loads."""
    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}/{k}")
        elif isinstance(node, list):
            for i, v in enumerate(node):
                rec(v, f"{prefix}/{i}")
        else:
            flat[prefix] = np.asarray(node, np.float32)

    rec(params, "yolo")
    np.savez_compressed(path, **flat)


def load_params(path: str) -> Dict[str, Any]:
    import jax.numpy as jnp
    data = np.load(path)
    root: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")[1:]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key], jnp.bfloat16)

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    params = listify(root)
    params["num_classes"] = params["heads"][0]["cls3"]["b"].shape[0]
    return params
