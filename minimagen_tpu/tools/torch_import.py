"""Import PyTorch reference checkpoints (.pth) into minimagen_tpu params.

Converts a reference U-Net state_dict (/root/reference/minimagen/Unet.py —
saved per-unet by its training loop, training.py:389,428) into this
framework's flax param tree, so users can bring trained reference weights
straight into the TPU framework.  The mapping mirrors both constructions
layer by layer; `tests/test_torch_import.py` proves output equivalence of the
two forward passes at identical weights.

Tensor layout transforms:
- torch Linear weight (out, in)        -> Dense kernel (in, out)
- torch Conv2d weight (out, in, kh, kw)-> Conv kernel (kh, kw, in, out)
- 1x1 convs that we express as Dense   -> squeeze spatial dims + transpose
- GroupNorm weight/bias                -> scale/bias
- scale-only LayerNorm gamma           -> gamma (frozen-zero beta buffer dropped)
- nn.LayerNorm weight/bias             -> gamma/beta
- ChanLayerNorm g (1, c, 1, 1)         -> g (c,)
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..models.unet import UnetConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()  # torch tensor
    return t  # tagged stand-in (export path)


def _linear(sd, tname, bias=True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{tname}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{tname}.bias"])
    return out


def _conv(sd, tname, bias=True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{tname}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(sd[f"{tname}.bias"])
    return out


def _conv1x1_as_dense(sd, tname, bias=False) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{tname}.weight"])  # (out, in, 1, 1)
    out = {"kernel": w[:, :, 0, 0].T}
    if bias:
        out["bias"] = _np(sd[f"{tname}.bias"])
    return out


def _groupnorm(sd, tname) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{tname}.weight"]), "bias": _np(sd[f"{tname}.bias"])}


def _scale_layernorm(sd, tname) -> Dict[str, np.ndarray]:
    # reference custom LayerNorm: learned gamma + frozen-zero beta buffer
    return {"gamma": _np(sd[f"{tname}.gamma"])}


def _affine_layernorm(sd, tname) -> Dict[str, np.ndarray]:
    return {"gamma": _np(sd[f"{tname}.weight"]), "beta": _np(sd[f"{tname}.bias"])}


def _chan_layernorm(sd, tname) -> Dict[str, np.ndarray]:
    return {"g": _np(sd[f"{tname}.g"]).reshape(-1)}


def _attention(sd, tprefix) -> Dict[str, Any]:
    """Reference multi-query Attention (layers.py:14-104) -> our Attention."""
    out = {
        "norm": _scale_layernorm(sd, f"{tprefix}.norm"),
        "null_kv": _np(sd[f"{tprefix}.null_kv"]),
        "to_q": {"kernel": _np(sd[f"{tprefix}.to_q.weight"]).T},
        "to_kv": {"kernel": _np(sd[f"{tprefix}.to_kv.weight"]).T},
        "to_out": {"kernel": _np(sd[f"{tprefix}.to_out.0.weight"]).T},
        "out_norm": _scale_layernorm(sd, f"{tprefix}.to_out.1"),
    }
    if f"{tprefix}.to_context.1.weight" in sd:
        out["context_norm"] = _affine_layernorm(sd, f"{tprefix}.to_context.0")
        out["to_context"] = _linear(sd, f"{tprefix}.to_context.1")
    return out


def _cross_attention(sd, tprefix) -> Dict[str, Any]:
    """Reference CrossAttention (layers.py:180-251) -> our CrossAttention."""
    return {
        "norm": _scale_layernorm(sd, f"{tprefix}.norm"),
        "null_kv": _np(sd[f"{tprefix}.null_kv"]),
        "to_q": {"kernel": _np(sd[f"{tprefix}.to_q.weight"]).T},
        "to_kv": {"kernel": _np(sd[f"{tprefix}.to_kv.weight"]).T},
        "to_out": {"kernel": _np(sd[f"{tprefix}.to_out.0.weight"]).T},
        "out_norm": _scale_layernorm(sd, f"{tprefix}.to_out.1"),
    }


def _block(sd, tprefix, norm=True) -> Dict[str, Any]:
    out = {"project": _conv(sd, f"{tprefix}.project")}
    if norm:
        out["groupnorm"] = _groupnorm(sd, f"{tprefix}.groupnorm")
    return out


def _resnet_block(sd, tprefix, *, has_time=True, has_cross=False,
                  has_res_conv=False) -> Dict[str, Any]:
    out = {
        "block1": _block(sd, f"{tprefix}.block1"),
        "block2": _block(sd, f"{tprefix}.block2"),
    }
    if has_time:
        out["time_mlp"] = _linear(sd, f"{tprefix}.time_mlp.1")
    if has_cross:
        # EinopsToAndFrom wraps the CrossAttention as `.fn` (layers.py:403-410)
        out["cross_attn"] = _cross_attention(sd, f"{tprefix}.cross_attn.fn")
    if has_res_conv:
        out["res_conv"] = _conv(sd, f"{tprefix}.res_conv")
    return out


def _transformer_block(sd, tprefix) -> Dict[str, Any]:
    """Reference TransformerBlock (layers.py:468-499): attn wrapped in
    EinopsToAndFrom as `.fn`; ff = Sequential(ChanLN, 1x1, GELU, ChanLN, 1x1)."""
    return {
        "attn": _attention(sd, f"{tprefix}.attn.fn"),
        "ff": {
            "norm_in": _chan_layernorm(sd, f"{tprefix}.ff.0"),
            "expand": _conv1x1_as_dense(sd, f"{tprefix}.ff.1"),
            "norm_mid": _chan_layernorm(sd, f"{tprefix}.ff.3"),
            "project": _conv1x1_as_dense(sd, f"{tprefix}.ff.4"),
        },
    }


def convert_unet_state_dict(sd: Dict[str, Any], config: UnetConfig) -> Dict[str, Any]:
    """Convert a reference U-Net torch state_dict into this framework's flax
    param tree for `UnetModel(config=config)`.

    :param sd: torch state_dict (tensors or numpy arrays), keys as produced by
        the reference Unet (Unet.py:25-328).
    :param config: the matching (post-cascade-cast) UnetConfig.
    """
    p: Dict[str, Any] = {}

    # time conditioning (reference Unet.py:101-138)
    p["to_time_hiddens"] = _linear(sd, "to_time_hiddens.1")
    p["to_time_cond"] = _linear(sd, "to_time_cond.0")
    p["to_time_tokens"] = _linear(sd, "to_time_tokens.0")
    if config.lowres_cond:
        p["to_lowres_time_hiddens"] = _linear(sd, "to_lowres_time_hiddens.1")
        p["to_lowres_time_cond"] = _linear(sd, "to_lowres_time_cond.0")
        p["to_lowres_time_tokens"] = _linear(sd, "to_lowres_time_tokens.0")

    # text conditioning (reference Unet.py:142-161)
    p["norm_cond"] = _affine_layernorm(sd, "norm_cond")
    p["text_to_cond"] = _linear(sd, "text_to_cond")
    p["null_text_embed"] = _np(sd["null_text_embed"])
    p["null_text_hidden"] = _np(sd["null_text_hidden"])
    p["text_nonattn_norm"] = _affine_layernorm(sd, "to_text_non_attn_cond.0")
    p["text_nonattn_dense1"] = _linear(sd, "to_text_non_attn_cond.1")
    p["text_nonattn_dense2"] = _linear(sd, "to_text_non_attn_cond.3")

    # stem (reference Unet.py:169-172): CrossEmbedLayer convs
    n_stem = len([k for k in sd if k.startswith("init_conv.convs.") and k.endswith(".weight")])
    p["init_conv"] = {f"conv_{i}": _conv(sd, f"init_conv.convs.{i}") for i in range(n_stem)}

    layer_params = config.layer_params()
    num_resolutions = len(layer_params)

    # DOWN path (reference Unet.py:237-261: [pre, init_block, blocks, attn, post])
    for L, ((dim_in, dim_out), nblocks, groups, layer_attn, layer_cross) in enumerate(layer_params):
        is_last = L == num_resolutions - 1
        current_dim = dim_out if config.memory_efficient else dim_in
        if config.memory_efficient:
            p[f"down{L}_pre"] = {"conv": _conv(sd, f"downs.{L}.0")}
        p[f"down{L}_init_block"] = _resnet_block(
            sd, f"downs.{L}.1", has_cross=layer_cross, has_res_conv=False
        )
        for j in range(nblocks):
            p[f"down{L}_block{j}"] = _resnet_block(sd, f"downs.{L}.2.{j}")
        if layer_attn:
            p[f"down{L}_attn"] = _transformer_block(sd, f"downs.{L}.3")
        if not config.memory_efficient:
            if not is_last:
                p[f"down{L}_post"] = {"conv": _conv(sd, f"downs.{L}.4")}
            else:
                p[f"down{L}_post"] = {
                    "conv3": _conv(sd, f"downs.{L}.4.fns.0"),
                    "conv1": _conv(sd, f"downs.{L}.4.fns.1"),
                }

    # MIDDLE (reference Unet.py:263-278)
    p["mid_block1"] = _resnet_block(sd, "mid_block1", has_cross=True)
    p["mid_block2"] = _resnet_block(sd, "mid_block2", has_cross=True)
    if config.attend_at_middle:
        # EinopsToAndFrom(Residual(Attention)): attention is .fn.fn
        p["mid_attn"] = _attention(sd, "mid_attn.fn.fn")

    # UP path (reference Unet.py:294-315: [init_block, blocks, attn, upsample])
    for R, ((dim_in, dim_out), nblocks, groups, layer_attn, layer_cross) in enumerate(
        reversed(layer_params)
    ):
        is_last = R == num_resolutions - 1
        p[f"up{R}_init_block"] = _resnet_block(
            sd, f"ups.{R}.0", has_cross=layer_cross, has_res_conv=True
        )
        for j in range(nblocks):
            p[f"up{R}_block{j}"] = _resnet_block(sd, f"ups.{R}.1.{j}", has_res_conv=True)
        if layer_attn:
            p[f"up{R}_attn"] = _transformer_block(sd, f"ups.{R}.2")
        if not is_last or config.memory_efficient:
            # reference Upsample = Sequential(nearest, conv) (layers.py:512-515)
            p[f"up{R}_upsample"] = {"conv": _conv(sd, f"ups.{R}.3.1")}

    # final (reference Unet.py:322-328)
    p["final_res_block"] = _resnet_block(sd, "final_res_block")
    p["final_conv"] = _conv(sd, "final_conv")
    return p


def export_unet_state_dict(params: Dict[str, Any], config: UnetConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_unet_state_dict`: flax param tree -> a
    reference-named torch-layout state_dict (numpy values; wrap with
    `torch.tensor` to save as .pth), so TPU-trained weights load into the
    PyTorch reference.

    Implemented by converting a template the other way and inverting each
    leaf's layout transform, so the name mapping lives in ONE place.
    """
    flat: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            else:
                flat[path] = np.asarray(v)

    walk(params)

    # build the forward name map by converting a shape-preserving index tree:
    # for each torch key we record which flax path each converted leaf came
    # from by re-running the converter over a "tagged" state dict.
    ref_keys = _reference_key_list(config)
    tagged = {k: _Tag(k) for k in ref_keys}
    converted = convert_unet_state_dict(tagged, config)

    out: Dict[str, np.ndarray] = {}

    def invert(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                invert(v, path)
                continue
            leaf = flat[path]
            torch_key, transform = v.key, v.transform
            if transform == "linear_w":
                out[torch_key] = leaf.T
            elif transform == "conv_w":
                out[torch_key] = leaf.transpose(3, 2, 0, 1)
            elif transform == "conv1x1_w":
                out[torch_key] = leaf.T[:, :, None, None]
            elif transform == "chan_g":
                out[torch_key] = leaf.reshape(1, -1, 1, 1)
            else:  # identity
                out[torch_key] = leaf

    invert(converted)

    # frozen-zero beta buffers of the scale-only LayerNorms exist in the
    # reference state_dict; emit zeros with the right shape
    for k in ref_keys:
        if k.endswith(".gamma"):
            beta_key = k[: -len("gamma")] + "beta"
            out[beta_key] = np.zeros_like(out[k])
    return out


class _Tag:
    """Stand-in leaf recording (torch key, layout transform) through the
    forward converter."""

    def __init__(self, key: str, transform: str = "id"):
        self.key = key
        self.transform = transform

    # the converter applies numpy ops to leaves; intercept the ones it uses
    @property
    def T(self):
        return _Tag(self.key, "linear_w")

    def transpose(self, *axes):
        if axes == (2, 3, 1, 0):
            return _Tag(self.key, "conv_w")
        raise NotImplementedError(axes)

    def __getitem__(self, idx):
        # conv1x1-as-dense does w[:, :, 0, 0].T — mark and swallow the .T
        return _Tag1x1(self.key)

    def reshape(self, *shape):
        return _Tag(self.key, "chan_g")


class _Tag1x1(_Tag):
    def __init__(self, key):
        super().__init__(key, "conv1x1_w")

    @property
    def T(self):
        return self


def _reference_key_list(config: UnetConfig):
    """All torch state_dict keys the converter may read for `config`.

    Derived from the reference module tree (Unet.py:25-328); includes the
    stem-conv count probe keys the converter scans for.
    """
    keys = []

    def linear(name):
        keys.extend([f"{name}.weight", f"{name}.bias"])

    def conv(name):
        keys.extend([f"{name}.weight", f"{name}.bias"])

    def conv_nb(name):
        keys.append(f"{name}.weight")

    def scale_ln(name):
        keys.append(f"{name}.gamma")

    def affine_ln(name):
        keys.extend([f"{name}.weight", f"{name}.bias"])

    def chan_ln(name):
        keys.append(f"{name}.g")

    def attention(p):
        scale_ln(f"{p}.norm")
        keys.append(f"{p}.null_kv")
        conv_nb(f"{p}.to_q")  # Linear no-bias: weight only
        conv_nb(f"{p}.to_kv")
        conv_nb(f"{p}.to_out.0")
        scale_ln(f"{p}.to_out.1")

    def resnet(p, has_time=True, has_cross=False, has_res=False):
        if has_time:
            linear(f"{p}.time_mlp.1")
        if has_cross:
            attention(f"{p}.cross_attn.fn")
        for blk in ("block1", "block2"):
            keys.extend([f"{p}.{blk}.groupnorm.weight", f"{p}.{blk}.groupnorm.bias"])
            conv(f"{p}.{blk}.project")
        if has_res:
            conv(f"{p}.res_conv")

    def transformer(p):
        attention(f"{p}.attn.fn")
        chan_ln(f"{p}.ff.0")
        conv_nb(f"{p}.ff.1")
        chan_ln(f"{p}.ff.3")
        conv_nb(f"{p}.ff.4")

    linear("to_time_hiddens.1")
    linear("to_time_cond.0")
    linear("to_time_tokens.0")
    if config.lowres_cond:
        linear("to_lowres_time_hiddens.1")
        linear("to_lowres_time_cond.0")
        linear("to_lowres_time_tokens.0")
    affine_ln("norm_cond")
    linear("text_to_cond")
    keys.extend(["null_text_embed", "null_text_hidden"])
    affine_ln("to_text_non_attn_cond.0")
    linear("to_text_non_attn_cond.1")
    linear("to_text_non_attn_cond.3")
    for i in range(3):  # CrossEmbed stem kernels (3, 7, 15)
        conv(f"init_conv.convs.{i}")

    layer_params = config.layer_params()
    n = len(layer_params)
    for L, (_, nblocks, _, layer_attn, layer_cross) in enumerate(layer_params):
        is_last = L == n - 1
        if config.memory_efficient:
            conv(f"downs.{L}.0")
        resnet(f"downs.{L}.1", has_cross=layer_cross)
        for j in range(nblocks):
            resnet(f"downs.{L}.2.{j}")
        if layer_attn:
            transformer(f"downs.{L}.3")
        if not config.memory_efficient:
            if not is_last:
                conv(f"downs.{L}.4")
            else:
                conv(f"downs.{L}.4.fns.0")
                conv(f"downs.{L}.4.fns.1")

    resnet("mid_block1", has_cross=True)
    resnet("mid_block2", has_cross=True)
    if config.attend_at_middle:
        attention("mid_attn.fn.fn")

    for R, (_, nblocks, _, layer_attn, layer_cross) in enumerate(reversed(layer_params)):
        is_last = R == n - 1
        resnet(f"ups.{R}.0", has_cross=layer_cross, has_res=True)
        for j in range(nblocks):
            resnet(f"ups.{R}.1.{j}", has_res=True)
        if layer_attn:
            transformer(f"ups.{R}.2")
        if not is_last or config.memory_efficient:
            conv(f"ups.{R}.3.1")

    resnet("final_res_block")
    conv("final_conv")
    return keys


def convert_reference_training_dir(directory: str):
    """Build an Imagen from a *reference* training directory: configs from
    parameters/*.json, weights converted from the torch .pth checkpoints in
    state_dicts/ (tmp/ fallback, mirroring reference generate.py:91-119).

    Requires torch to unpickle the .pth files.
    """
    import os

    import torch  # noqa: PLC0415

    from ..generate import load_params  # noqa: PLC0415
    from ..models.imagen import Imagen  # noqa: PLC0415

    unets_params, imagen_params = load_params(directory)
    imagen_params = {k: v for k, v in imagen_params.items() if k != "unets"}
    imagen = Imagen(unets=[UnetConfig.from_dict(x) for x in unets_params], **imagen_params)

    subdir = "state_dicts"
    files = os.listdir(os.path.join(directory, subdir))
    if not any(f.startswith("unet_") for f in files):
        subdir = "tmp"
        files = os.listdir(os.path.join(directory, subdir))

    params = {}
    for i in range(imagen.num_unets):
        candidates = sorted(f for f in files if f.startswith(f"unet_{i}") and f.endswith(".pth"))
        assert candidates, f"no .pth checkpoint for unet {i} in {directory}/{subdir}"
        sd = torch.load(os.path.join(directory, subdir, candidates[0]), map_location="cpu")
        params[f"unet_{i}"] = convert_unet_state_dict(sd, imagen.unet_configs[i])
    imagen.params = params
    return imagen


def _main():
    """Checkpoint conversion CLI.

    import: convert a PyTorch reference training directory into a
    minimagen_tpu training directory (configs copied, .pth -> .ckpt).
    export: convert a minimagen_tpu training directory's tmp/ weights into
    reference-layout .pth files.
    """
    import argparse
    import shutil

    parser = argparse.ArgumentParser(description=_main.__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser("import", help="reference .pth training dir -> minimagen_tpu dir")
    imp.add_argument("src")
    imp.add_argument("dst")
    exp = sub.add_parser("export", help="minimagen_tpu training dir -> reference .pth files")
    exp.add_argument("src")
    exp.add_argument("dst")
    args = parser.parse_args()

    import os

    if args.cmd == "import":
        from ..training import CKPT_EXT, create_directory, save_unet_checkpoint  # noqa: PLC0415

        imagen = convert_reference_training_dir(args.src)
        create_directory(args.dst)
        shutil.copytree(os.path.join(args.src, "parameters"),
                        os.path.join(args.dst, "parameters"), dirs_exist_ok=True)
        for i in range(imagen.num_unets):
            save_unet_checkpoint(
                os.path.join(args.dst, "state_dicts", f"unet_{i}_state_imported.{CKPT_EXT}"),
                imagen.params[f"unet_{i}"],
            )
        print(f"imported {imagen.num_unets} unets from {args.src} -> {args.dst}")
    else:
        import torch  # noqa: PLC0415

        from ..generate import load_minimagen  # noqa: PLC0415

        imagen = load_minimagen(args.src)
        os.makedirs(args.dst, exist_ok=True)
        for i in range(imagen.num_unets):
            sd = export_unet_state_dict(imagen.params[f"unet_{i}"], imagen.unet_configs[i])
            torch.save({k: torch.tensor(v) for k, v in sd.items()},
                       os.path.join(args.dst, f"unet_{i}_state_exported.pth"))
        print(f"exported {imagen.num_unets} unets from {args.src} -> {args.dst}")


if __name__ == "__main__":
    _main()
