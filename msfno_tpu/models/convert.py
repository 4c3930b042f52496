"""Reference (PyTorch) checkpoint -> flax param-tree converter.

Ingests the ECMWF FourCastNetv2-small ``weights.tar`` / reference training
checkpoints (layouts per MSFNO/Models/sfno/model.py:207-271: optional
"module." prefixes, dead "module.norm.*" keys dropped, film weights under
"film_gen."), remapping every tensor into this framework's channels-last
layout:

  torch Conv2d 1x1   (out, in, 1, 1)  ->  Dense kernel (in, out)
  torch Linear       (out, in)        ->  Dense kernel (in, out)
  pos_embed          (1, C, H, W)     ->  (H, W, C)
  spectral MLP w_l   (in, hid, 2)     ->  w{l} (in, hid, 2)      [unchanged]
  SpectralConvS2 w   (out, in, K, 2)  ->  w (K, in, out, 2)
  InstanceNorm affine (C,)            ->  norm scale/bias (C,)   [unchanged]

Works from either a torch state_dict (if torch is importable) or a
{name: np.ndarray} mapping.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np
from flax import traverse_util

DROP_KEYS = {"norm.weight", "norm.bias"}  # dead keys (model.py:218)
# torch_harmonics transform buffers — not parameters in this framework — and
# the ComplexReLU "real"-mode bias, which is a registered zero *buffer* never
# read in the forward pass (reference activations.py:20-23, 42-46)
BUFFER_PATTERNS = (
    re.compile(r"^(trans|itrans|trans_down|itrans_up)\."),
    re.compile(r"\.(ii|jj)$"),
    re.compile(r"\.filter\.activation\.bias$"),
)


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def strip_module_prefix(state: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Remove DDP "module." prefixes (model.py:232-240)."""
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k == "ged":
            continue
        out[k] = v
    return out


def _conv1x1_to_dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _linear_to_dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


_DROPPED = object()

# ViT params present in the reference state dict but never read by
# ViT.forward (vit.py:199-254): the sincos pos_embedding path is commented
# out, cls_token and decoder_position_code are vestigial
_VIT_DEAD = ("cls_token", "decoder_position_code", "pos_embedding")


def _convert_film_key(k: str, v: np.ndarray):
    """Map a reference ``film_gen.*`` key to this framework's film tree.

    Handles the ViT ("transformer") generator (vit.py:163-258) and the MAE
    film head (sfnonet.py:880-928).  Returns (path, array), _DROPPED for dead
    params, or None for unmappable families (GCN).
    """
    rest = k[len("film_gen."):]

    # MAE film head: FeedForward Sequential(LN, Linear, GELU, Dropout, Linear)
    m = re.match(r"^film_head\.net\.([014])\.(weight|bias)$", rest)
    if m:
        idx, kind = m.groups()
        sub = {"0": "norm", "1": "fc1", "4": "fc2"}[idx]
        if sub == "norm":
            name = "scale" if kind == "weight" else "bias"
            return f"film_gen/film_head/{sub}/{name}", v
        name = "kernel" if kind == "weight" else "bias"
        return (
            f"film_gen/film_head/{sub}/{name}",
            _linear_to_dense(v) if kind == "weight" else v,
        )

    if not rest.startswith("film_gen."):
        return None
    g = rest[len("film_gen."):]

    if any(g.startswith(dead) for dead in _VIT_DEAD):
        return _DROPPED

    base = "film_gen/film_gen"
    m = re.match(r"^to_patch_embedding\.(norm1|lin|norm2)\.(weight|bias)$", g)
    if m:
        sub, kind = m.groups()
        if sub == "lin":
            return (
                f"{base}/patch_proj/{'kernel' if kind == 'weight' else 'bias'}",
                _linear_to_dense(v) if kind == "weight" else v,
            )
        name = "scale" if kind == "weight" else "bias"
        return f"{base}/patch_{sub}/{name}", v
    if g == "encoder_position_code":
        return f"{base}/encoder_position_code", v[0]
    m = re.match(r"^transformer\.layers\.(\d+)\.0\.norm\.(weight|bias)$", g)
    if m:
        i, kind = m.groups()
        return (
            f"{base}/transformer/attn_{i}/norm/"
            f"{'scale' if kind == 'weight' else 'bias'}",
            v,
        )
    m = re.match(r"^transformer\.layers\.(\d+)\.0\.to_qkv\.weight$", g)
    if m:
        return (
            f"{base}/transformer/attn_{m.group(1)}/to_qkv/kernel",
            _linear_to_dense(v),
        )
    m = re.match(r"^transformer\.layers\.(\d+)\.0\.to_out\.0\.(weight|bias)$", g)
    if m:
        i, kind = m.groups()
        return (
            f"{base}/transformer/attn_{i}/to_out/"
            f"{'kernel' if kind == 'weight' else 'bias'}",
            _linear_to_dense(v) if kind == "weight" else v,
        )
    m = re.match(r"^transformer\.layers\.(\d+)\.1\.net\.([014])\.(weight|bias)$", g)
    if m:
        i, idx, kind = m.groups()
        sub = {"0": "norm", "1": "fc1", "4": "fc2"}[idx]
        if sub == "norm":
            return (
                f"{base}/transformer/ff_{i}/norm/"
                f"{'scale' if kind == 'weight' else 'bias'}",
                v,
            )
        return (
            f"{base}/transformer/ff_{i}/{sub}/"
            f"{'kernel' if kind == 'weight' else 'bias'}",
            _linear_to_dense(v) if kind == "weight" else v,
        )
    m = re.match(r"^transformer\.norm\.(weight|bias)$", g)
    if m:
        kind = m.group(1)
        return (
            f"{base}/transformer/norm/{'scale' if kind == 'weight' else 'bias'}",
            v,
        )
    m = re.match(r"^head_film\.(weight|bias)$", g)
    if m:
        kind = m.group(1)
        return (
            f"{base}/head_film/{'kernel' if kind == 'weight' else 'bias'}",
            _linear_to_dense(v) if kind == "weight" else v,
        )
    return None


def convert_sfno_state_dict(
    state: Mapping[str, object], num_layers: int = 12
) -> dict:
    """Reference FourierNeuralOperatorNet(_Filmed) state_dict -> flax params.

    Unknown keys are collected under "_unconverted" names in the returned
    report; call sites should assert it is empty for strict loads.
    """
    state = strip_module_prefix({k: _to_numpy(v) for k, v in state.items()})
    flat: dict[str, np.ndarray] = {}
    report: list[str] = []

    def put(path: str, v: np.ndarray):
        flat[path] = v

    for k, v in state.items():
        if k in DROP_KEYS or any(p.search(k) for p in BUFFER_PATTERNS):
            # one exception inside the buffer patterns: for
            # complex_activation in (modulus, halfplane) the ComplexReLU
            # bias is a TRAINED (hidden, 1, 1) parameter (activations.py:
            # 15-19), not the zero scalar buffer of real/cartesian modes
            if k.endswith(".filter.activation.bias") and _to_numpy(v).size > 1:
                m = re.match(r"^blocks\.(\d+)\.", k)
                if m:
                    put(
                        f"blocks_{m.group(1)}/filter/act_bias",
                        _to_numpy(v).reshape(-1),
                    )
            continue
        m = re.match(r"^encoder\.fwd\.(\d)\.(weight|bias)$", k)
        if m:
            idx, kind = m.groups()
            fc = "fc1" if idx == "0" else "fc2"
            put(
                f"encoder/{fc}/{'kernel' if kind == 'weight' else 'bias'}",
                _conv1x1_to_dense(v) if kind == "weight" else v,
            )
            continue
        m = re.match(r"^decoder\.fwd\.(\d)\.(weight|bias)$", k)
        if m:
            idx, kind = m.groups()
            fc = "fc1" if idx == "0" else "fc2"
            put(
                f"decoder/{fc}/{'kernel' if kind == 'weight' else 'bias'}",
                _conv1x1_to_dense(v) if kind == "weight" else v,
            )
            continue
        if k == "pos_embed":
            put("pos_embed", np.ascontiguousarray(np.transpose(v[0], (1, 2, 0))))
            continue
        m = re.match(r"^blocks\.(\d+)\.(.*)$", k)
        if m:
            i, rest = m.groups()
            base = f"blocks_{i}"
            m2 = re.match(r"^norm([01])\.(weight|bias)$", rest)
            if m2:
                n, kind = m2.groups()
                # instance_norm affine is (C,); layer_norm affine is the
                # reference's (H, W) -> channels-last broadcast (H, W, 1)
                put(
                    f"{base}/norm{n}/{'scale' if kind == 'weight' else 'bias'}",
                    v if v.ndim == 1 else v[..., None],
                )
                continue
            m2 = re.match(r"^filter_layer\.filter\.w\.(\d+)$", rest)
            if m2:
                put(f"{base}/filter/w{m2.group(1)}", v)
                continue
            if rest == "filter_layer.filter.wout":
                put(f"{base}/filter/wout", v)
                continue
            if rest == "filter_layer.filter.w":
                if v.ndim == 5:
                    # SpectralConv2d (out, in, L, M, 2) -> (L, M, in, out, 2)
                    # (reference layers.py:290-295 w/ contract "bixy,kixy")
                    put(f"{base}/filter/w", np.transpose(v, (2, 3, 1, 0, 4)))
                else:
                    # SpectralConvS2 (out, in, K, 2) -> (K, in, out, 2)
                    put(f"{base}/filter/w", np.transpose(v, (2, 1, 0, 3)))
                continue
            m2 = re.match(r"^(inner_skip|outer_skip)\.(weight|bias)$", rest)
            if m2:
                name, kind = m2.groups()
                put(
                    f"{base}/{name}/{'kernel' if kind == 'weight' else 'bias'}",
                    _conv1x1_to_dense(v) if kind == "weight" else v,
                )
                continue
            m2 = re.match(r"^mlp\.fwd\.(\d)\.(weight|bias)$", rest)
            if m2:
                idx, kind = m2.groups()
                fc = "fc1" if idx == "0" else "fc2"
                put(
                    f"{base}/mlp/{fc}/{'kernel' if kind == 'weight' else 'bias'}",
                    _conv1x1_to_dense(v) if kind == "weight" else v,
                )
                continue
            report.append(k)
            continue
        if k.startswith("film_gen."):
            mapped = _convert_film_key(k, v)
            if mapped is _DROPPED:
                continue
            if mapped is not None:
                put(*mapped)
                continue
            # GCN/GCN_custom weights are deliberately not mappable: the
            # reference generators operate on a ragged ocean graph with
            # asset-file adjacency (gcn/gcn.py:21-23, gcn/layers.py:36);
            # this framework's dense masked-grid redesign has a different
            # parameter geometry, so those checkpoints require re-training.
            report.append(k)
            continue
        report.append(k)

    # num_layers guard: a checkpoint with a different block count would
    # otherwise convert silently and fail much later as a shape/scope
    # mismatch during load
    got_blocks = {
        int(m.group(1))
        for key in flat
        for m in [re.match(r"^blocks_(\d+)/", key)]
        if m
    }
    if got_blocks and len(got_blocks) != num_layers:
        raise ValueError(
            f"checkpoint has {len(got_blocks)} blocks, model expects "
            f"{num_layers} (pass num_layers= to match the checkpoint)"
        )

    params = traverse_util.unflatten_dict(flat, sep="/")
    return {"params": params, "unconverted": report}


def convert_afno_state_dict(
    state: Mapping[str, object],
    img_size: tuple[int, int] = (720, 1440),
    patch_size: tuple[int, int] = (8, 8),
) -> dict:
    """Reference AFNONet (FourCastNet v1) state_dict -> flax params
    (reference MSFNO/Models/fourcastnet/afnonet.py:351-480).

    Layout changes: patch-embed conv (D, C, ph, pw) -> Dense kernel over the
    (p1 p2 c)-flattened patch; pos_embed (1, N, D) -> (gh, gw, D); Linear
    transposes.  The reference's final `self.norm` is constructed but never
    applied in forward (afnonet.py:431-441), so its params are dropped —
    the same dead-key situation as the SFNO checkpoint's "module.norm".
    PrecipNet's conv maps to precip head params when present.
    """
    state = strip_module_prefix({k: _to_numpy(v) for k, v in state.items()})
    gh = img_size[0] // patch_size[0]
    gw = img_size[1] // patch_size[1]
    flat: dict[str, np.ndarray] = {}
    report: list[str] = []
    # PrecipNet stores its AFNONet under `self.backbone` (reference
    # afnonet.py:326-348), so its checkpoints prefix every backbone key with
    # "backbone." — and the flax PrecipNet tree nests the same way
    # ({"backbone": {...}, "conv": {...}}).  Strip the prefix for matching
    # and re-nest the converted entries under backbone/.
    precip = any(k.startswith("backbone.") for k in state)
    if precip:
        state = {
            (k[len("backbone."):] if k.startswith("backbone.") else k): v
            for k, v in state.items()
        }
    for k, v in state.items():
        if k in ("norm.weight", "norm.bias"):
            continue  # dead final norm (never called in forward)
        if k == "pos_embed":
            flat["pos_embed"] = np.ascontiguousarray(
                v[0].reshape(gh, gw, v.shape[-1])
            )
            continue
        if k == "patch_embed.proj.weight":
            # (D, C, ph, pw) -> ((ph pw C), D) matching the (p1 p2 c) rearrange
            d = v.shape[0]
            flat["patch_embed/kernel"] = np.ascontiguousarray(
                np.transpose(v, (2, 3, 1, 0)).reshape(-1, d)
            )
            continue
        if k == "patch_embed.proj.bias":
            flat["patch_embed/bias"] = v
            continue
        if k == "head.weight":
            flat["head/kernel"] = _linear_to_dense(v)
            continue
        m = re.match(r"^blocks\.(\d+)\.(.*)$", k)
        if m:
            i, rest = m.groups()
            base = f"blocks_{i}"
            m2 = re.match(r"^norm([12])\.(weight|bias)$", rest)
            if m2:
                n, kind = m2.groups()
                flat[f"{base}/norm{n}/{'scale' if kind == 'weight' else 'bias'}"] = v
                continue
            m2 = re.match(r"^filter\.(w1|b1|w2|b2)$", rest)
            if m2:
                flat[f"{base}/filter/{m2.group(1)}"] = v
                continue
            m2 = re.match(r"^mlp\.fc([12])\.(weight|bias)$", rest)
            if m2:
                n, kind = m2.groups()
                flat[
                    f"{base}/mlp_fc{n}/{'kernel' if kind == 'weight' else 'bias'}"
                ] = _linear_to_dense(v) if kind == "weight" else v
                continue
            report.append(k)
            continue
        # PrecipNet wrapper: ppad has no params; conv -> flax Conv HWIO
        m = re.match(r"^conv\.(weight|bias)$", k)
        if m:
            kind = m.group(1)
            if kind == "weight":  # (O, I, kh, kw) -> (kh, kw, I, O)
                flat["conv/kernel"] = np.ascontiguousarray(
                    np.transpose(v, (2, 3, 1, 0))
                )
            else:
                flat["conv/bias"] = v
            continue
        report.append(k)
    if precip:
        flat = {
            (k if k.startswith("conv/") else f"backbone/{k}"): v
            for k, v in flat.items()
        }
    params = traverse_util.unflatten_dict(flat, sep="/")
    return {"params": params, "unconverted": report}


def export_sfno_state_dict(params: Mapping) -> dict[str, np.ndarray]:
    """Inverse of convert_sfno_state_dict: flax param tree -> reference
    torch state_dict names/layouts, so checkpoints trained here load into the
    reference codebase (load with strict=False there — transform buffers
    ii/jj and the dead ComplexReLU bias are intentionally not emitted).

    Covers the backbone, the ViT ("transformer") film generator and the MAE
    film head; GCN generators have no reference-compatible geometry.
    """
    flat = traverse_util.flatten_dict(params, sep="/")
    out: dict[str, np.ndarray] = {}

    def dense_to_conv1x1(w):
        return np.ascontiguousarray(w.T)[..., None, None]

    def dense_to_linear(w):
        return np.ascontiguousarray(np.asarray(w).T)

    for k, v in flat.items():
        v = np.asarray(v)
        parts = k.split("/")
        if k == "pos_embed":
            out["pos_embed"] = np.ascontiguousarray(
                np.transpose(v, (2, 0, 1))
            )[None]
            continue
        if parts[0] in ("encoder", "decoder") and len(parts) == 3:
            idx = "0" if parts[1] == "fc1" else "2"
            kind = parts[2]
            name = f"{parts[0]}.fwd.{idx}.{'weight' if kind == 'kernel' else 'bias'}"
            out[name] = dense_to_conv1x1(v) if kind == "kernel" else v
            continue
        m = re.match(r"^blocks_(\d+)$", parts[0])
        if m:
            i, rest = m.group(1), parts[1:]
            base = f"blocks.{i}"
            if rest[0] in ("norm0", "norm1"):
                kind = "weight" if rest[1] == "scale" else "bias"
                w = v[..., 0] if v.ndim == 3 else v  # (H,W,1) -> (H,W)
                out[f"{base}.{rest[0]}.{kind}"] = w
                continue
            if rest[0] == "filter":
                if rest[1] == "w":
                    if v.ndim == 5:
                        # SpectralConv2d (L, M, in, out, 2) -> (out, in, L, M, 2)
                        out[f"{base}.filter_layer.filter.w"] = (
                            np.ascontiguousarray(np.transpose(v, (3, 2, 0, 1, 4)))
                        )
                    else:
                        # SpectralConvS2 (K, in, out, 2) -> (out, in, K, 2)
                        out[f"{base}.filter_layer.filter.w"] = (
                            np.ascontiguousarray(np.transpose(v, (2, 1, 0, 3)))
                        )
                elif rest[1] == "wout":
                    out[f"{base}.filter_layer.filter.wout"] = v
                elif rest[1] == "act_bias":
                    # trained ComplexReLU bias: inverse of the import's
                    # reshape(-1) — the reference stores (hidden, 1, 1)
                    out[f"{base}.filter_layer.filter.activation.bias"] = (
                        v.reshape(-1, 1, 1)
                    )
                elif re.match(r"^w\d+$", rest[1]):
                    out[f"{base}.filter_layer.filter.w.{rest[1][1:]}"] = v
                else:  # tt factors w0/w1/w2 handled above; anything else kept
                    out[f"{base}.filter_layer.filter.{rest[1]}"] = v
                continue
            if rest[0] in ("inner_skip", "outer_skip"):
                kind = rest[1]
                out[f"{base}.{rest[0]}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                    dense_to_conv1x1(v) if kind == "kernel" else v
                )
                continue
            if rest[0] == "mlp":
                idx = "0" if rest[1] == "fc1" else "2"
                kind = rest[2]
                out[f"{base}.mlp.fwd.{idx}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                    dense_to_conv1x1(v) if kind == "kernel" else v
                )
                continue
        if parts[0] == "film_gen":
            name = _export_film_key(parts[1:], v, dense_to_linear)
            if name is not None:
                out[name[0]] = name[1]
            continue
    return out


def _export_film_key(parts, v, dense_to_linear):
    """flax film param path -> reference state_dict entry (ViT + MAE head)."""
    if parts[0] == "film_head":  # MAE head FeedForward
        sub, kind = parts[1], parts[2]
        idx = {"norm": "0", "fc1": "1", "fc2": "4"}[sub]
        name = f"film_gen.film_head.net.{idx}." + (
            "weight" if kind in ("kernel", "scale") else "bias"
        )
        return name, dense_to_linear(v) if kind == "kernel" else v
    if parts[0] != "film_gen":
        return None
    g = parts[1:]
    base = "film_gen.film_gen"
    if g[0].startswith("patch_norm"):
        n = g[0][-1]
        kind = "weight" if g[1] == "scale" else "bias"
        return f"{base}.to_patch_embedding.norm{n}.{kind}", v
    if g[0] == "patch_proj":
        kind = "weight" if g[1] == "kernel" else "bias"
        return (
            f"{base}.to_patch_embedding.lin.{kind}",
            dense_to_linear(v) if g[1] == "kernel" else v,
        )
    if g[0] == "encoder_position_code":
        return f"{base}.encoder_position_code", v[None]
    if g[0] == "head_film":
        kind = "weight" if g[1] == "kernel" else "bias"
        return (
            f"{base}.head_film.{kind}",
            dense_to_linear(v) if g[1] == "kernel" else v,
        )
    if g[0] == "transformer":
        if g[1] == "norm":
            kind = "weight" if g[2] == "scale" else "bias"
            return f"{base}.transformer.norm.{kind}", v
        m = re.match(r"^(attn|ff)_(\d+)$", g[1])
        if m:
            sub, i = m.groups()
            if sub == "attn":
                if g[2] == "norm":
                    kind = "weight" if g[3] == "scale" else "bias"
                    return f"{base}.transformer.layers.{i}.0.norm.{kind}", v
                if g[2] == "to_qkv":
                    return (
                        f"{base}.transformer.layers.{i}.0.to_qkv.weight",
                        dense_to_linear(v),
                    )
                if g[2] == "to_out":
                    kind = "weight" if g[3] == "kernel" else "bias"
                    return (
                        f"{base}.transformer.layers.{i}.0.to_out.0.{kind}",
                        dense_to_linear(v) if g[3] == "kernel" else v,
                    )
            else:
                idx = {"norm": "0", "fc1": "1", "fc2": "4"}[g[2]]
                kind = "weight" if g[3] in ("kernel", "scale") else "bias"
                return (
                    f"{base}.transformer.layers.{i}.1.net.{idx}.{kind}",
                    dense_to_linear(v) if g[3] == "kernel" else v,
                )
    return None


TORCH_CHECKPOINT_SUFFIXES = (".tar", ".pkl", ".pt", ".ckpt")


def is_torch_checkpoint(path: str) -> bool:
    """True when `path` should route through the torch-free converter.

    Directory check matters: an Orbax checkpoint DIRECTORY renamed to
    e.g. run1.ckpt must not be fed to the torch zip/pickle reader."""
    import os

    return path.endswith(TORCH_CHECKPOINT_SUFFIXES) and not os.path.isdir(path)


def load_ecmwf_weights_tar(path: str, num_layers: int = 12) -> dict:
    """Load the ECMWF weights.tar / a reference .pkl checkpoint and convert.

    Torch-free: the file is read by msfno_tpu.models.torch_reader (zip and
    legacy torch.save formats), so ingestion works in torch-less images.
    Checkpoint nesting per reference load_model (model.py:213-216) and
    Trainer.save_checkpoint (train.py:779-819): the state dict lives under
    "model_state" when wrapped, else the file IS the state dict.
    """
    from msfno_tpu.models.torch_reader import (
        load_torch_checkpoint,
        state_dict_arrays,
    )

    checkpoint = load_torch_checkpoint(path)
    weights = (
        checkpoint.get("model_state", checkpoint)
        if isinstance(checkpoint, dict)
        else checkpoint
    )
    return convert_sfno_state_dict(
        state_dict_arrays(weights), num_layers=num_layers
    )
