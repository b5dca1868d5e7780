"""Weight-port parity tests for the extractor architectures.

Pattern of the reference's pinned-h5 regression (reference
tests/test_feature_extractors.py:84-169, atol 1e-3): identical weights
through an independent torch implementation and our flax port must agree.

* CLIP (PLIP): oracle = HuggingFace ``transformers.CLIPModel`` — the exact
  class the reference extractor uses.
* ImageViT (UNI / UNI2 / Virchow families): oracle = a minimal torch module
  in this file implementing the timm ViT semantics the converter targets
  (packed qkv, LayerScale, register tokens, SwiGLUPacked with its inner
  norm).
* TICON: oracle = the reference's vendored torch implementation
  (see test_ticon_parity.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stamp_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionTower,
    convert_clip_vision_state_dict,
)
from stamp_tpu.models.vit_image import (
    ImageViT,
    ViTConfig,
    convert_torch_state_dict,
)


def _flax_apply(module, variables, images_nhwc):
    import jax.numpy as jnp

    return np.asarray(module.apply(variables, jnp.asarray(images_nhwc)))


# ---------------------------------------------------------------------------
# CLIP vision tower vs transformers.CLIPModel
# ---------------------------------------------------------------------------


def test_clip_vision_tower_matches_hf_clip():
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(0)
    hf_cfg = CLIPConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, projection_dim=64,
        ),
        vision_config=dict(
            hidden_size=64, intermediate_size=128, num_hidden_layers=3,
            num_attention_heads=4, image_size=56, patch_size=14,
            projection_dim=64, hidden_act="quick_gelu",
        ),
        projection_dim=64,
    )
    hf = CLIPModel(hf_cfg).eval()

    images = torch.randn(2, 3, 56, 56)
    with torch.inference_mode():
        ref = hf.get_image_features(pixel_values=images).numpy()

    cfg = CLIPVisionConfig(
        img_size=56, patch_size=14, embed_dim=64, depth=3, num_heads=4,
        mlp_dim=128, projection_dim=64,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = convert_clip_vision_state_dict(sd, cfg)
    ours = _flax_apply(
        CLIPVisionTower(cfg), variables, images.permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-3)


# ---------------------------------------------------------------------------
# ImageViT vs a minimal torch module with timm semantics
# ---------------------------------------------------------------------------


class _TorchTimmViT(torch.nn.Module):
    """The timm ViT semantics `convert_torch_state_dict` targets, written
    independently in torch: packed qkv, optional LayerScale (ls1/ls2.gamma),
    register tokens, MLP or SwiGLUPacked (gate = silu(x1)·x2 with an inner
    norm before fc2), pre-LN blocks, CLS pooling."""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        self.cfg = cfg
        D = cfg.embed_dim
        n_patches = (cfg.img_size // cfg.patch_size) ** 2
        self.patch = torch.nn.Conv2d(3, D, cfg.patch_size, cfg.patch_size)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, D) * 0.02)
        pos_len = n_patches + (1 if cfg.pos_embed_cls else 0)
        self.pos_embed = torch.nn.Parameter(torch.randn(1, pos_len, D) * 0.02)
        if cfg.num_reg_tokens:
            self.reg_token = torch.nn.Parameter(
                torch.randn(1, cfg.num_reg_tokens, D) * 0.02
            )
        self.blocks = torch.nn.ModuleList()
        hidden = int(D * cfg.mlp_ratio)
        for _ in range(cfg.depth):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(D, eps=cfg.norm_eps)
            blk.qkv = torch.nn.Linear(D, 3 * D, bias=cfg.qkv_bias)
            blk.proj = torch.nn.Linear(D, D)
            blk.norm2 = torch.nn.LayerNorm(D, eps=cfg.norm_eps)
            blk.fc1 = torch.nn.Linear(D, hidden)
            if cfg.ffn == "swiglu":
                blk.mlp_norm = torch.nn.LayerNorm(hidden // 2, eps=1e-6)
                blk.fc2 = torch.nn.Linear(hidden // 2, D)
            else:
                blk.fc2 = torch.nn.Linear(hidden, D)
            if cfg.init_values is not None:
                blk.ls1 = torch.nn.Parameter(torch.full((D,), cfg.init_values))
                blk.ls2 = torch.nn.Parameter(torch.full((D,), cfg.init_values))
            self.blocks.append(blk)
        self.norm = torch.nn.LayerNorm(D, eps=cfg.norm_eps)

    def forward(self, images):  # [B, 3, H, W]
        cfg = self.cfg
        b = images.shape[0]
        x = self.patch(images).flatten(2).transpose(1, 2)  # [B, N, D]
        if cfg.pos_embed_cls:
            cls = self.cls_token.expand(b, -1, -1) + self.pos_embed[:, :1]
            x = x + self.pos_embed[:, 1:]
        else:
            cls = self.cls_token.expand(b, -1, -1)
            x = x + self.pos_embed
        tokens = [cls]
        if cfg.num_reg_tokens:
            tokens.append(self.reg_token.expand(b, -1, -1))
        tokens.append(x)
        x = torch.cat(tokens, dim=1)

        H = cfg.num_heads
        for blk in self.blocks:
            h = blk.norm1(x)
            B, N, D = h.shape
            qkv = blk.qkv(h).reshape(B, N, 3, H, D // H).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (D // H) ** -0.5
            attn = attn.softmax(dim=-1)
            h = (attn @ v).transpose(1, 2).reshape(B, N, D)
            h = blk.proj(h)
            if cfg.init_values is not None:
                h = h * blk.ls1
            x = x + h

            h = blk.norm2(x)
            h = blk.fc1(h)
            if cfg.ffn == "swiglu":
                x1, x2 = h.chunk(2, dim=-1)
                h = blk.fc2(blk.mlp_norm(torch.nn.functional.silu(x1) * x2))
            else:
                h = blk.fc2(torch.nn.functional.gelu(h))
            if cfg.init_values is not None:
                h = h * blk.ls2
            x = x + h

        x = self.norm(x)
        n_prefix = cfg.num_prefix_tokens
        if cfg.pool == "token":
            return x[:, 0]
        if cfg.pool == "token_avg_concat":
            return torch.cat([x[:, 0], x[:, n_prefix:].mean(dim=1)], dim=-1)
        return x[:, n_prefix:].mean(dim=1)

    def timm_state_dict(self):
        """Rename to the timm checkpoint keys the converter expects."""
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch.weight.detach().numpy()
        sd["patch_embed.proj.bias"] = self.patch.bias.detach().numpy()
        sd["cls_token"] = self.cls_token.detach().numpy()
        sd["pos_embed"] = self.pos_embed.detach().numpy()
        if self.cfg.num_reg_tokens:
            sd["reg_token"] = self.reg_token.detach().numpy()
        for i, blk in enumerate(self.blocks):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = blk.norm1.weight.detach().numpy()
            sd[p + "norm1.bias"] = blk.norm1.bias.detach().numpy()
            sd[p + "norm2.weight"] = blk.norm2.weight.detach().numpy()
            sd[p + "norm2.bias"] = blk.norm2.bias.detach().numpy()
            sd[p + "attn.qkv.weight"] = blk.qkv.weight.detach().numpy()
            if self.cfg.qkv_bias:
                sd[p + "attn.qkv.bias"] = blk.qkv.bias.detach().numpy()
            sd[p + "attn.proj.weight"] = blk.proj.weight.detach().numpy()
            sd[p + "attn.proj.bias"] = blk.proj.bias.detach().numpy()
            sd[p + "mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
            sd[p + "mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
            sd[p + "mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
            sd[p + "mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
            if self.cfg.ffn == "swiglu":
                sd[p + "mlp.norm.weight"] = blk.mlp_norm.weight.detach().numpy()
                sd[p + "mlp.norm.bias"] = blk.mlp_norm.bias.detach().numpy()
            if self.cfg.init_values is not None:
                sd[p + "ls1.gamma"] = blk.ls1.detach().numpy()
                sd[p + "ls2.gamma"] = blk.ls2.detach().numpy()
        sd["norm.weight"] = self.norm.weight.detach().numpy()
        sd["norm.bias"] = self.norm.bias.detach().numpy()
        return sd


@pytest.mark.parametrize(
    "arch_cfg",
    [
        # UNI-like: ViT w/ LayerScale, plain MLP
        ViTConfig(
            img_size=64, patch_size=16, embed_dim=64, depth=3, num_heads=4,
            init_values=1e-5,
        ),
        # UNI2-like: SwiGLUPacked + register tokens + LayerScale
        ViTConfig(
            img_size=56, patch_size=14, embed_dim=48, depth=2, num_heads=4,
            mlp_ratio=8 / 3, ffn="swiglu", num_reg_tokens=8, init_values=1e-5,
            act="silu",
        ),
        # Virchow-full-like: SwiGLU, CLS ⧺ mean pooling
        ViTConfig(
            img_size=56, patch_size=14, embed_dim=32, depth=2, num_heads=4,
            mlp_ratio=5.0, ffn="swiglu", init_values=1e-5,
            pool="token_avg_concat",
        ),
    ],
    ids=["uni-like", "uni2-like", "virchow-full-like"],
)
def test_image_vit_matches_torch(arch_cfg):
    torch.manual_seed(0)
    oracle = _TorchTimmViT(arch_cfg).eval()
    images = torch.randn(2, 3, arch_cfg.img_size, arch_cfg.img_size)
    with torch.inference_mode():
        ref = oracle(images).numpy()

    variables = convert_torch_state_dict(oracle.timm_state_dict(), arch_cfg)
    ours = _flax_apply(
        ImageViT(arch_cfg), variables, images.permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-3)
