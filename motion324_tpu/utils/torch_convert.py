"""Torch checkpoint -> JAX param-tree conversion.

Converts reference Motion324 checkpoints (``ckpt_*.pt`` with the state-dict
naming of reference model/Pcd_motion.py:268-344 / model/transformer.py) and
torch-hub DINOv2 ``dinov2_vitb14`` weights into this framework's flax param
tree. Conventions:

- torch ``nn.Linear.weight`` is ``(out, in)`` -> flax ``Dense.kernel`` is
  ``(in, out)`` (transposed);
- torch ``Conv2d.weight`` is ``(out, in, kh, kw)`` -> flax ``Conv.kernel`` is
  ``(kh, kw, in, out)``;
- the reference's ``pos_embed`` buffer is dropped (our pos-embed is computed;
  the reference itself deletes it at load time — utils/inference_utils.py:39-40);
- the head ``shared_mlp_output`` Sequential maps to head_norm/head_fc1/head_fc2
  (reference model/Pcd_motion.py:336-341).
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_motion_checkpoint", "convert_dinov2_vitb14",
           "convert_hunyuan3d_dit", "convert_shape_vae", "convert_dinov2_hf",
           "convert_u2net", "convert_isnet", "convert_lpips",
           "load_torch_state_dict", "convert_mv_conditioner"]


def load_torch_state_dict(path: str) -> dict:
    """Load a .pt checkpoint on CPU and return the model state dict."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _dense(sd, name):
    p = {"kernel": sd[f"{name}.weight"].T.astype(np.float32)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return p


def _ln(sd, name):
    p = {"scale": sd[f"{name}.weight"].astype(np.float32)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return p


def _rms(sd, name):
    return {"weight": sd[f"{name}.weight"].astype(np.float32)}


def _self_attn(sd, name, use_qk_norm=True):
    out = {
        "to_qkv": _dense(sd, f"{name}.to_qkv"),
        "fc": _dense(sd, f"{name}.fc"),
    }
    if use_qk_norm:
        out["q_norm"] = _rms(sd, f"{name}.q_norm")
        out["k_norm"] = _rms(sd, f"{name}.k_norm")
    return out


def _cross_attn(sd, name, use_qk_norm=True):
    out = {
        "to_q": _dense(sd, f"{name}.to_q"),
        "to_k": _dense(sd, f"{name}.to_k"),
        "to_v": _dense(sd, f"{name}.to_v"),
        "fc": _dense(sd, f"{name}.fc"),
    }
    if use_qk_norm:
        out["q_norm"] = _rms(sd, f"{name}.q_norm")
        out["k_norm"] = _rms(sd, f"{name}.k_norm")
    return out


def _mlp(sd, name):
    # reference MLP is nn.Sequential(Linear, GELU, Linear, Dropout): mlp.0 / mlp.2
    return {"fc1": _dense(sd, f"{name}.mlp.0"),
            "fc2": _dense(sd, f"{name}.mlp.2")}


def _self_block(sd, name, use_qk_norm=True):
    return {
        "norm1": _ln(sd, f"{name}.norm1"),
        "attn": _self_attn(sd, f"{name}.attn", use_qk_norm),
        "norm2": _ln(sd, f"{name}.norm2"),
        "mlp": _mlp(sd, f"{name}.mlp"),
    }


def _cross_block(sd, name, use_qk_norm=True):
    return {
        "norm_q": _ln(sd, f"{name}.norm_q"),
        "norm_kv": _ln(sd, f"{name}.norm_kv"),
        "attn": _cross_attn(sd, f"{name}.attn", use_qk_norm),
        "norm2": _ln(sd, f"{name}.norm2"),
        "mlp": _mlp(sd, f"{name}.mlp"),
    }


def _stack_layers(trees: list[dict]) -> dict:
    """Per-layer param dicts -> one dict with a leading layer axis per leaf
    (the layout produced by ``stack_blocks``/nn.scan)."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def convert_motion_checkpoint(sd: dict, n_pairs: int = 8, pcd_layers: int = 4,
                              use_qk_norm: bool = True,
                              dino: dict | None = None) -> dict:
    """Reference Motion_Latent_Model state dict -> our flax ``{'params': ...}``.

    ``dino``: optionally a converted DINOv2 param tree to splice in (the
    reference checkpoint embeds the frozen encoder under ``image_encoder.model``
    in torch-hub naming).
    """
    params: dict = {
        "learnable_tokens": sd["learnable_tokens"].astype(np.float32),
        "special_token_0": sd["special_token_0"].astype(np.float32),
        "special_token_rest": sd["special_token_rest"].astype(np.float32),
        "point_embed_mlp": _dense(sd, "point_embed.mlp"),
        "point_normal_rgb_proj": _dense(sd, "point_normal_rgb_proj"),
        "encoder_cross_attn": _cross_block(sd, "encoder_cross_attn", use_qk_norm),
        "input_layernorm": _ln(sd, "transformer_input_layernorm"),
        # scanned per-frame decoder: params broadcast over T (no leading axis)
        "point_decoder": {
            "cross": _cross_block(sd, "decoder_cross_attn", use_qk_norm),
            "head_norm": _ln(sd, "shared_mlp_output.0"),
            "head_fc1": _dense(sd, "shared_mlp_output.1"),
            "head_fc2": _dense(sd, "shared_mlp_output.3"),
        },
    }
    params["pcd_blocks"] = {"layers": {"block": _stack_layers([
        _self_block(sd, f"points_transformer_blocks.{i}", use_qk_norm)
        for i in range(pcd_layers)])}}
    params["alternating_blocks"] = {"layers": {"block": _stack_layers([
        {"global": _self_block(sd, f"global_transformer_blocks.{i}", use_qk_norm),
         "local": _self_block(sd, f"local_transformer_blocks.{i}", use_qk_norm)}
        for i in range(n_pairs)])}}

    if dino is not None:
        params["image_encoder"] = dino
    else:
        dino_sd = {k.removeprefix("image_encoder.model."): v
                   for k, v in sd.items()
                   if k.startswith("image_encoder.model.")}
        if dino_sd:
            depth = 0
            while f"blocks.{depth}.norm1.weight" in dino_sd:
                depth += 1
            params["image_encoder"] = convert_dinov2_vitb14(dino_sd,
                                                            depth=depth)
    return {"params": params}


def convert_dinov2_vitb14(sd: dict, depth: int = 12) -> dict:
    """torch-hub DINOv2 state dict -> our DinoViT param tree.

    torch-hub naming: patch_embed.proj, cls_token, pos_embed,
    blocks.{i}.{norm1,attn.qkv,attn.proj,ls1.gamma,norm2,mlp.fc1,mlp.fc2,ls2.gamma},
    norm.
    """
    conv_w = sd["patch_embed.proj.weight"]  # (C, 3, 14, 14)
    params: dict = {
        "patch_embed": {
            "kernel": conv_w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": sd["patch_embed.proj.bias"].astype(np.float32),
        },
        "cls_token": sd["cls_token"].astype(np.float32),
        "pos_embed": sd["pos_embed"].astype(np.float32),
        "norm": _ln(sd, "norm"),
    }
    layers = []
    for i in range(depth):
        b = f"blocks.{i}"
        layers.append({
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": {"qkv": _dense(sd, f"{b}.attn.qkv"),
                     "proj": _dense(sd, f"{b}.attn.proj")},
            "ls1_gamma": sd[f"{b}.ls1.gamma"].astype(np.float32),
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp_fc1": _dense(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{b}.mlp.fc2"),
            "ls2_gamma": sd[f"{b}.ls2.gamma"].astype(np.float32),
        })
    params["blocks"] = {"layers": {"block": _stack_layers(layers)}}
    return params


# --------------------------------------------------------------------------- #
# hy3dgen: Hunyuan3DDiT + ShapeVAE
# --------------------------------------------------------------------------- #
def convert_hunyuan3d_dit(sd: dict, depth: int = 16,
                          depth_single: int = 32) -> dict:
    """Reference ``Hunyuan3DDiT`` state dict -> our flax param tree.

    Layout reference: hunyuan3ddit.py:284-410 (double_blocks.N.{img,txt}_attn
    with fused qkv ordered (3, H, D) — identical to our fused split — plus
    adaLN Modulation 'lin' layers, fused single-block linear1/linear2, and the
    LastLayer adaLN_modulation). Validated numerically against the reference
    torch module in tests/test_ref_parity.py.
    """
    def dense(name):
        return _dense(sd, name)

    def rms(name):
        return {"scale": sd[f"{name}.scale"].astype(np.float32)}

    doubles = []
    for i in range(depth):
        b = f"double_blocks.{i}"
        doubles.append({
            "img_mod": {"lin": dense(f"{b}.img_mod.lin")},
            "txt_mod": {"lin": dense(f"{b}.txt_mod.lin")},
            "img_attn": {"qkv": dense(f"{b}.img_attn.qkv"),
                         "q_norm": rms(f"{b}.img_attn.norm.query_norm"),
                         "k_norm": rms(f"{b}.img_attn.norm.key_norm")},
            "txt_attn": {"qkv": dense(f"{b}.txt_attn.qkv"),
                         "q_norm": rms(f"{b}.txt_attn.norm.query_norm"),
                         "k_norm": rms(f"{b}.txt_attn.norm.key_norm")},
            "img_proj": dense(f"{b}.img_attn.proj"),
            "txt_proj": dense(f"{b}.txt_attn.proj"),
            "img_mlp_fc1": dense(f"{b}.img_mlp.0"),
            "img_mlp_fc2": dense(f"{b}.img_mlp.2"),
            "txt_mlp_fc1": dense(f"{b}.txt_mlp.0"),
            "txt_mlp_fc2": dense(f"{b}.txt_mlp.2"),
        })
    singles = []
    for i in range(depth_single):
        b = f"single_blocks.{i}"
        singles.append({
            "modulation": {"lin": dense(f"{b}.modulation.lin")},
            "linear1": dense(f"{b}.linear1"),
            "linear2": dense(f"{b}.linear2"),
            "q_norm": rms(f"{b}.norm.query_norm"),
            "k_norm": rms(f"{b}.norm.key_norm"),
        })
    params = {
        "latent_in": _dense(sd, "latent_in"),
        "cond_in": _dense(sd, "cond_in"),
        "time_in": {"in_layer": _dense(sd, "time_in.in_layer"),
                    "out_layer": _dense(sd, "time_in.out_layer")},
        "double_blocks": {"block": _stack_layers(doubles)},
        "single_blocks": {"block": _stack_layers(singles)},
        "final_mod": _dense(sd, "final_layer.adaLN_modulation.1"),
        "final_linear": _dense(sd, "final_layer.linear"),
    }
    return {"params": params}


def convert_shape_vae(sd: dict, num_layers: int = 16) -> dict:
    """Reference ``ShapeVAE`` (decoder path) state dict -> our flax tree.

    Layout reference: autoencoders/model.py:132-189 + attention_blocks.py
    (post_kl, transformer.resblocks.N.{attn.c_qkv,attn.c_proj,ln_1,ln_2,
    mlp.c_fc,mlp.c_proj}, geo_decoder.{query_proj,cross_attn_decoder,ln_post,
    output_proj}). The fused qkv is per-head (B, L, H, 3*hd) in BOTH
    implementations, so weights transpose directly.
    """
    blocks = []
    for i in range(num_layers):
        b = f"transformer.resblocks.{i}"
        blocks.append({
            "ln_1": _ln(sd, f"{b}.ln_1"),
            "c_qkv": _dense(sd, f"{b}.attn.c_qkv"),
            "c_proj": _dense(sd, f"{b}.attn.c_proj"),
            "ln_2": _ln(sd, f"{b}.ln_2"),
            "c_fc": _dense(sd, f"{b}.mlp.c_fc"),
            "c_proj_mlp": _dense(sd, f"{b}.mlp.c_proj"),
        })
    g = "geo_decoder.cross_attn_decoder"
    params = {
        "post_kl": _dense(sd, "post_kl"),
        "blocks": {"layers": {"block": _stack_layers(blocks)}},
        "query_proj": _dense(sd, "geo_decoder.query_proj"),
        "geo_decoder": {
            "ln_1": _ln(sd, f"{g}.ln_1"),
            "ln_2": _ln(sd, f"{g}.ln_2"),
            "ln_3": _ln(sd, f"{g}.ln_3"),
            "c_q": _dense(sd, f"{g}.attn.c_q"),
            "c_kv": _dense(sd, f"{g}.attn.c_kv"),
            "c_proj": _dense(sd, f"{g}.attn.c_proj"),
            "c_fc": _dense(sd, f"{g}.mlp.c_fc"),
            "c_proj_mlp": _dense(sd, f"{g}.mlp.c_proj"),
        },
        "ln_post": _ln(sd, "geo_decoder.ln_post"),
        "output_proj": _dense(sd, "geo_decoder.output_proj"),
    }
    return {"params": params}


def convert_dinov2_hf(sd: dict, depth: int = 12, swiglu: bool = False) -> dict:
    """HF ``transformers.Dinov2Model`` state dict -> our DinoViT param tree.

    Covers both the MLP variant (ViT-S/B/L) and the SwiGLU FFN variant
    (ViT-giant, the reference's shape-gen conditioner — conditioner.py:96-133).
    HF stores q/k/v separately; our fused qkv concatenates them along the
    output axis (identical per-head channel order). Validated against the real
    torch implementation in tests/test_ref_parity.py.
    """
    def t(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    conv_w = t("embeddings.patch_embeddings.projection.weight")
    params: dict = {
        "patch_embed": {"kernel": conv_w.transpose(2, 3, 1, 0),
                        "bias": t("embeddings.patch_embeddings.projection.bias")},
        "cls_token": t("embeddings.cls_token"),
        "pos_embed": t("embeddings.position_embeddings"),
        "norm": {"scale": t("layernorm.weight"), "bias": t("layernorm.bias")},
    }
    layers = []
    for i in range(depth):
        b = f"encoder.layer.{i}"
        qkv_w = np.concatenate([t(f"{b}.attention.attention.query.weight").T,
                                t(f"{b}.attention.attention.key.weight").T,
                                t(f"{b}.attention.attention.value.weight").T],
                               axis=1)
        qkv_b = np.concatenate([t(f"{b}.attention.attention.query.bias"),
                                t(f"{b}.attention.attention.key.bias"),
                                t(f"{b}.attention.attention.value.bias")])
        layer = {
            "norm1": {"scale": t(f"{b}.norm1.weight"),
                      "bias": t(f"{b}.norm1.bias")},
            "attn": {"qkv": {"kernel": qkv_w, "bias": qkv_b},
                     "proj": {"kernel": t(f"{b}.attention.output.dense.weight").T,
                              "bias": t(f"{b}.attention.output.dense.bias")}},
            "ls1_gamma": t(f"{b}.layer_scale1.lambda1"),
            "norm2": {"scale": t(f"{b}.norm2.weight"),
                      "bias": t(f"{b}.norm2.bias")},
            "ls2_gamma": t(f"{b}.layer_scale2.lambda1"),
        }
        if swiglu:
            layer["mlp_w12"] = {"kernel": t(f"{b}.mlp.weights_in.weight").T,
                                "bias": t(f"{b}.mlp.weights_in.bias")}
            layer["mlp_w3"] = {"kernel": t(f"{b}.mlp.weights_out.weight").T,
                               "bias": t(f"{b}.mlp.weights_out.bias")}
        else:
            layer["mlp_fc1"] = {"kernel": t(f"{b}.mlp.fc1.weight").T,
                                "bias": t(f"{b}.mlp.fc1.bias")}
            layer["mlp_fc2"] = {"kernel": t(f"{b}.mlp.fc2.weight").T,
                                "bias": t(f"{b}.mlp.fc2.bias")}
        layers.append(layer)
    params["blocks"] = {"layers": {"block": _stack_layers(layers)}}
    return params


# --------------------------------------------------------------------------- #
# U2Net (u2net.pth, xuebinqin/U-2-Net naming) and LPIPS
# --------------------------------------------------------------------------- #
def _conv_bn(sd, name):
    """torch REBNCONV {conv_s1, bn_s1} -> our _ConvBNReLU {conv, bn} (+stats)."""
    w = sd[f"{name}.conv_s1.weight"]  # (out, in, 3, 3)
    params = {"conv": {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
                       "bias": sd[f"{name}.conv_s1.bias"].astype(np.float32)},
              "bn": {"scale": sd[f"{name}.bn_s1.weight"].astype(np.float32),
                     "bias": sd[f"{name}.bn_s1.bias"].astype(np.float32)}}
    stats = {"bn": {"mean": sd[f"{name}.bn_s1.running_mean"].astype(np.float32),
                    "var": sd[f"{name}.bn_s1.running_var"].astype(np.float32)}}
    return params, stats


def _rsu(sd, name, height):
    """torch RSU{height} -> our RSU tree: rebnconvin/conv_in,
    rebnconv{i+1}/enc_i, rebnconv{height}/bottom, rebnconv{i+1}d/dec_i."""
    params, stats = {}, {}

    def put(our, theirs):
        p, s = _conv_bn(sd, f"{name}.{theirs}")
        params[our] = p
        stats[our] = s

    put("conv_in", "rebnconvin")
    for i in range(height - 1):
        put(f"enc_{i}", f"rebnconv{i + 1}")
    put("bottom", f"rebnconv{height}")
    for i in range(height - 1):
        put(f"dec_{i}", f"rebnconv{i + 1}d")
    return params, stats


def _rsu4f(sd, name):
    """torch RSU4F -> our RSU4F tree (e1..e4 = rebnconv1..4, d3..d1)."""
    params, stats = {}, {}

    def put(our, theirs):
        p, s = _conv_bn(sd, f"{name}.{theirs}")
        params[our] = p
        stats[our] = s

    put("conv_in", "rebnconvin")
    for i in range(1, 5):
        put(f"e{i}", f"rebnconv{i}")
    for i in (3, 2, 1):
        put(f"d{i}", f"rebnconv{i}d")
    return params, stats


def convert_u2net(sd: dict) -> dict:
    """u2net.pth state dict -> our flax U2Net variables (params + batch_stats).

    Layout reference: the public U-2-Net torch implementation the reference's
    rembg sessions run as ONNX (reference: utils/rmbg_for_black_bg.py:26,
    utils/inference_utils.py:198-234). Heights per stage: RSU7..RSU4 encoders,
    two RSU4F at the bottom, mirrored decoders, side1..side6 + outconv.
    """
    heights = {"stage1": 7, "stage2": 6, "stage3": 5, "stage4": 4,
               "stage1d": 7, "stage2d": 6, "stage3d": 5, "stage4d": 4}
    params: dict = {}
    stats: dict = {}
    for st, h in heights.items():
        params[st], stats[st] = _rsu(sd, st, h)
    for st in ("stage5", "stage6", "stage5d"):
        params[st], stats[st] = _rsu4f(sd, st)
    for i in range(1, 7):
        w = sd[f"side{i}.weight"]
        params[f"side{i}"] = {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
                              "bias": sd[f"side{i}.bias"].astype(np.float32)}
    params["outconv"] = {
        "kernel": sd["outconv.weight"].transpose(2, 3, 1, 0).astype(np.float32),
        "bias": sd["outconv.bias"].astype(np.float32)}
    return {"params": params, "batch_stats": stats}


def convert_isnet(sd: dict) -> dict:
    """isnet-general-use (DIS ``ISNetDIS``) state dict -> flax ISNet variables.

    Layout reference: the DIS repo's ISNetDIS — a ``myrebnconv`` stem
    (``conv_in.{conv,bn}``), the same RSU stages as U2Net, and side1..side6
    convs with NO fused outconv (reference preprocessing model:
    utils/rmbg_for_black_bg.py:26). Only ``side1`` feeds the mask; the other
    side heads are training-time deep supervision and are left unconsumed.
    """
    heights = {"stage1": 7, "stage2": 6, "stage3": 5, "stage4": 4,
               "stage1d": 7, "stage2d": 6, "stage3d": 5, "stage4d": 4}
    params: dict = {}
    stats: dict = {}
    # myrebnconv stem: conv/bn (not conv_s1/bn_s1)
    w = sd["conv_in.conv.weight"]
    params["conv_in"] = {
        "conv": {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
                 "bias": sd["conv_in.conv.bias"].astype(np.float32)},
        "bn": {"scale": sd["conv_in.bn.weight"].astype(np.float32),
               "bias": sd["conv_in.bn.bias"].astype(np.float32)}}
    stats["conv_in"] = {
        "bn": {"mean": sd["conv_in.bn.running_mean"].astype(np.float32),
               "var": sd["conv_in.bn.running_var"].astype(np.float32)}}
    for st, h in heights.items():
        params[st], stats[st] = _rsu(sd, st, h)
    for st in ("stage5", "stage6", "stage5d"):
        params[st], stats[st] = _rsu4f(sd, st)
    w = sd["side1.weight"]
    params["side1"] = {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
                       "bias": sd["side1.bias"].astype(np.float32)}
    return {"params": params, "batch_stats": stats}


def convert_lpips(lins_sd: dict, vgg_sd: dict) -> dict:
    """LPIPS weights -> our LPIPSVGG params.

    ``lins_sd``: the lpips package checkpoint (``lin{i}.model.1.weight``, the
    five 1x1 non-negative heads — reference evaluation/lpips/lpips.py:22-180);
    ``vgg_sd``: torchvision ``vgg16.features`` state dict
    (``features.{idx}.weight/bias`` at conv indices 0,2,5,7,10,12,14,17,
    19,21,24,26,28).
    """
    vgg_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    convs = {}
    for our_i, t_i in enumerate(vgg_conv_idx):
        w = vgg_sd[f"features.{t_i}.weight"]
        convs[f"conv_{our_i}"] = {
            "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": vgg_sd[f"features.{t_i}.bias"].astype(np.float32)}
    lins = [np.asarray(lins_sd[f"lin{i}.model.1.weight"],
                       np.float32).reshape(-1) for i in range(5)]
    return {"vgg": {"params": convs}, "lins": lins}


def convert_mv_conditioner(sd: dict, depth: int = 24) -> dict:
    """Reference multiview conditioner state dict -> DinoConditionerMV tree.

    The reference stores the HF Dinov2Model under
    ``main_image_encoder.model.*`` (conditioner.py:214-257 SingleImageEncoder
    wrapping DinoImageEncoderMV); the sincos view table is a buffer we
    recompute deterministically, so only the ViT weights convert. Accepts
    either the wrapped prefix or a bare HF dict.
    """
    for prefix in ("main_image_encoder.model.", "model.", ""):
        inner = {k[len(prefix):]: v for k, v in sd.items()
                 if k.startswith(prefix + "embeddings.")
                 or k.startswith(prefix + "encoder.")
                 or k.startswith(prefix + "layernorm.")}
        if inner:
            break
    if not inner:
        raise ValueError("no Dinov2Model weights found in state dict")
    swiglu = any("weights_in" in k for k in inner)
    return {"dino": convert_dinov2_hf(inner, depth=depth, swiglu=swiglu)}
