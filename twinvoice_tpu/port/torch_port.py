"""One-shot porter: reference torch ``state_dict`` → JAX (params, state) pytrees.

The reference checkpoint schema (from unet_model.py:29-53, verified against the
124,267,083-byte ``checkpoints/best_unet_model.pth`` LFS object):

  down{1..4}.net.{0,3}.{weight,bias}            Conv2d  (O,I,3,3)
  down{1..4}.net.{1,4}.{weight,bias,running_mean,running_var,num_batches_tracked}
  bottleneck.net.*                              same DoubleConv schema
  up{4..1}.{weight,bias}                        ConvTranspose2d (I,O,2,2)
  conv{4..1}.net.*                              decoder DoubleConvs
  out_conv.{weight,bias}                        Conv2d (3,64,1,1)

Layout transposes:
  Conv2d          OIHW → HWIO:  (2,3,1,0)
  ConvTranspose2d IOHW → (kH,kW,I,O): (2,3,0,1)   (matches conv_transpose2x2)

``export_state_dict`` is the inverse, so checkpoints round-trip both ways.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from twinvoice_tpu.config import UNetConfig


def _np(x):
    """torch.Tensor | np.ndarray → np.ndarray (no torch import needed for np)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _port_conv(sd, prefix, dtype):
    return {
        "kernel": jnp.asarray(_np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0), dtype),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"]), dtype),
    }


def _port_bn(sd, prefix, dtype):
    params = {
        "scale": jnp.asarray(_np(sd[prefix + ".weight"]), dtype),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"]), dtype),
    }
    state = {
        "mean": jnp.asarray(_np(sd[prefix + ".running_mean"]), dtype),
        "var": jnp.asarray(_np(sd[prefix + ".running_var"]), dtype),
    }
    return params, state


def _port_double_conv(sd, prefix, dtype):
    bn1_p, bn1_s = _port_bn(sd, prefix + ".net.1", dtype)
    bn2_p, bn2_s = _port_bn(sd, prefix + ".net.4", dtype)
    params = {
        "conv1": _port_conv(sd, prefix + ".net.0", dtype),
        "bn1": bn1_p,
        "conv2": _port_conv(sd, prefix + ".net.3", dtype),
        "bn2": bn2_p,
    }
    return params, {"bn1": bn1_s, "bn2": bn2_s}


def _port_conv_transpose(sd, prefix, dtype):
    return {
        "kernel": jnp.asarray(_np(sd[prefix + ".weight"]).transpose(2, 3, 0, 1), dtype),
        "bias": jnp.asarray(_np(sd[prefix + ".bias"]), dtype),
    }


def port_state_dict(sd, cfg: UNetConfig = UNetConfig(), *, dtype=jnp.float32):
    """Port a reference-schema state_dict (tensors or ndarrays) → (params, state)."""
    params = {"enc": [], "dec": [], "up": []}
    state = {"enc": [], "dec": []}
    for i in range(1, cfg.depth + 1):
        p, s = _port_double_conv(sd, f"down{i}", dtype)
        params["enc"].append(p)
        state["enc"].append(s)
    p, s = _port_double_conv(sd, "bottleneck", dtype)
    params["bottleneck"] = p
    state["bottleneck"] = s
    for i in range(cfg.depth, 0, -1):  # up4, conv4, up3, conv3, ...
        params["up"].append(_port_conv_transpose(sd, f"up{i}", dtype))
        p, s = _port_double_conv(sd, f"conv{i}", dtype)
        params["dec"].append(p)
        state["dec"].append(s)
    params["out"] = _port_conv(sd, "out_conv", dtype)
    return params, state


def load_pth(path, cfg: UNetConfig = UNetConfig(), *, dtype=jnp.float32):
    """Load a reference ``.pth`` checkpoint file and port it."""
    import torch  # optional dep; only needed when actually loading .pth files

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return port_state_dict(sd, cfg, dtype=dtype)


# ---------------------------------------------------------------------------
# inverse: JAX pytrees → reference-schema state_dict (numpy)
# ---------------------------------------------------------------------------


def _export_double_conv(out, prefix, p, s):
    out[prefix + ".net.0.weight"] = np.asarray(p["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    out[prefix + ".net.0.bias"] = np.asarray(p["conv1"]["bias"])
    out[prefix + ".net.1.weight"] = np.asarray(p["bn1"]["scale"])
    out[prefix + ".net.1.bias"] = np.asarray(p["bn1"]["bias"])
    out[prefix + ".net.1.running_mean"] = np.asarray(s["bn1"]["mean"])
    out[prefix + ".net.1.running_var"] = np.asarray(s["bn1"]["var"])
    out[prefix + ".net.3.weight"] = np.asarray(p["conv2"]["kernel"]).transpose(3, 2, 0, 1)
    out[prefix + ".net.3.bias"] = np.asarray(p["conv2"]["bias"])
    out[prefix + ".net.4.weight"] = np.asarray(p["bn2"]["scale"])
    out[prefix + ".net.4.bias"] = np.asarray(p["bn2"]["bias"])
    out[prefix + ".net.4.running_mean"] = np.asarray(s["bn2"]["mean"])
    out[prefix + ".net.4.running_var"] = np.asarray(s["bn2"]["var"])


def export_state_dict(params, state, cfg: UNetConfig = UNetConfig()):
    """(params, state) → reference-schema dict of numpy arrays."""
    out = {}
    for i, (p, s) in enumerate(zip(params["enc"], state["enc"])):
        _export_double_conv(out, f"down{i + 1}", p, s)
    _export_double_conv(out, "bottleneck", params["bottleneck"], state["bottleneck"])
    for j, (up, p, s) in enumerate(zip(params["up"], params["dec"], state["dec"])):
        i = cfg.depth - j  # up4 first
        out[f"up{i}.weight"] = np.asarray(up["kernel"]).transpose(2, 3, 0, 1)
        out[f"up{i}.bias"] = np.asarray(up["bias"])
        _export_double_conv(out, f"conv{i}", p, s)
    out["out_conv.weight"] = np.asarray(params["out"]["kernel"]).transpose(3, 2, 0, 1)
    out["out_conv.bias"] = np.asarray(params["out"]["bias"])
    return out
