"""Weight-converter parity tests for the CoCa/BEiT3 towers and the five
slide encoders (TITAN, GigaPath LongNet, PRISM, COBRA, MADELEINE).

Pattern of tests/test_extractor_parity.py (itself modeled on the
reference's pinned-h5 regression, reference
tests/test_feature_extractors.py:84-169): a randomly-initialized torch
module written independently in this file carries the *upstream checkpoint
layout* each ``convert_*_state_dict`` targets; identical weights pushed
through both implementations must agree to atol 1e-3.  The torch modules
are the executable documentation of the layouts — packed vs separate qkv,
multiway ``.A`` branches, MultiheadAttention kdim packing, mamba-ssm conv
shapes — since the gated upstream checkpoints themselves cannot be
downloaded in a zero-egress build.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from stamp_tpu.models.beit3 import Beit3Config, Beit3VisionTower, convert_beit3_state_dict  # noqa: E402
from stamp_tpu.models.coca import CoCaVisionConfig, CoCaVisionTower, convert_coca_state_dict  # noqa: E402
from stamp_tpu.models.slide_encoders import (  # noqa: E402
    CobraNet,
    LongNetViT,
    MadeleineNet,
    PrismPerceiver,
    TitanViT,
    convert_cobra_state_dict,
    convert_gigapath_slide_state_dict,
    convert_madeleine_state_dict,
    convert_prism_state_dict,
    convert_titan_state_dict,
)


def _np(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy()


def _mha_block_forward(x, blk, num_heads):
    """Shared torch forward for a pre-LN block with packed qkv (timm style)."""
    b, n, d = x.shape
    h = blk.norm1(x)
    qkv = blk.qkv(h).reshape(b, n, 3, num_heads, d // num_heads)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (d // num_heads) ** -0.5
    h = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, n, d)
    x = x + blk.proj(h)
    h = blk.norm2(x)
    return x + blk.fc2(F.gelu(blk.fc1(h)))


def _make_packed_block(d, hidden, eps):
    blk = torch.nn.Module()
    blk.norm1 = torch.nn.LayerNorm(d, eps=eps)
    blk.qkv = torch.nn.Linear(d, 3 * d)
    blk.proj = torch.nn.Linear(d, d)
    blk.norm2 = torch.nn.LayerNorm(d, eps=eps)
    blk.fc1 = torch.nn.Linear(d, hidden)
    blk.fc2 = torch.nn.Linear(hidden, d)
    return blk


def _packed_block_sd(sd, prefix, blk, mlp_prefix="mlp."):
    sd[prefix + "norm1.weight"] = _np(blk.norm1.weight)
    sd[prefix + "norm1.bias"] = _np(blk.norm1.bias)
    sd[prefix + "attn.qkv.weight"] = _np(blk.qkv.weight)
    sd[prefix + "attn.qkv.bias"] = _np(blk.qkv.bias)
    sd[prefix + "attn.proj.weight"] = _np(blk.proj.weight)
    sd[prefix + "attn.proj.bias"] = _np(blk.proj.bias)
    sd[prefix + "norm2.weight"] = _np(blk.norm2.weight)
    sd[prefix + "norm2.bias"] = _np(blk.norm2.bias)
    sd[prefix + mlp_prefix + "fc1.weight"] = _np(blk.fc1.weight)
    sd[prefix + mlp_prefix + "fc1.bias"] = _np(blk.fc1.bias)
    sd[prefix + mlp_prefix + "fc2.weight"] = _np(blk.fc2.weight)
    sd[prefix + mlp_prefix + "fc2.bias"] = _np(blk.fc2.bias)


# ---------------------------------------------------------------------------
# CONCH / CONCH1.5 — CoCa vision tower
# ---------------------------------------------------------------------------


class _TorchCoCaTower(torch.nn.Module):
    """CONCH VisualModel layout: timm trunk under ``visual.trunk``, an
    open_clip AttentionalPooler (``attn_pool_contrast``: LayerNormed learned
    query + nn.MultiheadAttention with kdim = trunk width) and
    ``ln_contrast``; ``encode_image(..., proj_contrast=False)`` stops before
    the contrastive projection (reference extractor/conch.py:23-41)."""

    def __init__(self, cfg: CoCaVisionConfig):
        super().__init__()
        self.cfg = cfg
        w, eps = cfg.width, cfg.norm_eps
        n = (cfg.img_size // cfg.patch_size) ** 2
        self.patch = torch.nn.Conv2d(3, w, cfg.patch_size, cfg.patch_size)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, w) * 0.02)
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n + 1, w) * 0.02)
        self.blocks = torch.nn.ModuleList(
            [_make_packed_block(w, 4 * w, eps) for _ in range(cfg.depth)]
        )
        self.norm = torch.nn.LayerNorm(w, eps=eps)
        d = cfg.pooled_dim
        self.pool_query = torch.nn.Parameter(torch.randn(1, d) * 0.02)
        self.pool_ln_q = torch.nn.LayerNorm(d, eps=eps)
        self.pool_ln_k = torch.nn.LayerNorm(w, eps=eps)
        self.pool_attn = torch.nn.MultiheadAttention(
            d, cfg.pool_heads, kdim=w, vdim=w, batch_first=True
        )
        self.ln_contrast = torch.nn.LayerNorm(d, eps=eps)

    def forward(self, images):
        b = images.shape[0]
        x = self.patch(images).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = _mha_block_forward(x, blk, self.cfg.num_heads)
        x = self.norm(x)
        q = self.pool_ln_q(self.pool_query).unsqueeze(0).expand(b, -1, -1)
        kv = self.pool_ln_k(x)
        pooled, _ = self.pool_attn(q, kv, kv, need_weights=False)
        return self.ln_contrast(pooled[:, 0])

    def checkpoint(self):
        sd = {
            "visual.trunk.patch_embed.proj.weight": _np(self.patch.weight),
            "visual.trunk.patch_embed.proj.bias": _np(self.patch.bias),
            "visual.trunk.cls_token": _np(self.cls_token),
            "visual.trunk.pos_embed": _np(self.pos_embed),
            "visual.trunk.norm.weight": _np(self.norm.weight),
            "visual.trunk.norm.bias": _np(self.norm.bias),
            "visual.ln_contrast.weight": _np(self.ln_contrast.weight),
            "visual.ln_contrast.bias": _np(self.ln_contrast.bias),
        }
        for i, blk in enumerate(self.blocks):
            _packed_block_sd(sd, f"visual.trunk.blocks.{i}.", blk)
        p = "visual.attn_pool_contrast."
        sd[p + "query"] = _np(self.pool_query)
        for ln, name in ((self.pool_ln_q, "ln_q"), (self.pool_ln_k, "ln_k")):
            sd[p + name + ".weight"] = _np(ln.weight)
            sd[p + name + ".bias"] = _np(ln.bias)
        a = self.pool_attn
        sd[p + "attn.q_proj_weight"] = _np(a.q_proj_weight)
        sd[p + "attn.k_proj_weight"] = _np(a.k_proj_weight)
        sd[p + "attn.v_proj_weight"] = _np(a.v_proj_weight)
        sd[p + "attn.in_proj_bias"] = _np(a.in_proj_bias)
        sd[p + "attn.out_proj.weight"] = _np(a.out_proj.weight)
        sd[p + "attn.out_proj.bias"] = _np(a.out_proj.bias)
        return sd


@pytest.mark.parametrize(
    "cfg",
    [
        # conch-like: pooled dim < trunk width
        CoCaVisionConfig(
            img_size=32, patch_size=16, width=32, depth=2, num_heads=4,
            pooled_dim=16, pool_heads=4,
        ),
        # conch1_5-like proportions at toy scale
        CoCaVisionConfig(
            img_size=32, patch_size=16, width=48, depth=3, num_heads=4,
            pooled_dim=24, pool_heads=4,
        ),
    ],
    ids=["conch-like", "conch1_5-like"],
)
def test_coca_converter_matches_torch(cfg):
    torch.manual_seed(0)
    oracle = _TorchCoCaTower(cfg).eval()
    images = torch.randn(2, 3, cfg.img_size, cfg.img_size)
    with torch.inference_mode():
        ref = oracle(images).numpy()

    variables = convert_coca_state_dict(oracle.checkpoint(), cfg)
    ours = CoCaVisionTower(cfg).apply(
        variables, jnp.asarray(images.permute(0, 2, 3, 1).numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)


# ---------------------------------------------------------------------------
# MUSK — BEiT3 vision tower (torchscale multiway layout)
# ---------------------------------------------------------------------------


class _TorchBeit3Tower(torch.nn.Module):
    """BEiT3/torchscale layout: multiway modules under ``.A`` (vision
    branch), separate q/k/v with bias-free k, inner_attn_ln, sub-LayerNorm
    FFN, positional embedding with two reserved padding rows (reference
    extractor/musk.py:22-58 drives the upstream equivalent)."""

    def __init__(self, cfg: Beit3Config):
        super().__init__()
        self.cfg = cfg
        w, eps = cfg.width, cfg.norm_eps
        n = (cfg.img_size // cfg.patch_size) ** 2
        self.patch = torch.nn.Conv2d(3, w, cfg.patch_size, cfg.patch_size)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, w) * 0.02)
        self.pos = torch.nn.Parameter(torch.randn(n + 3, w) * 0.02)
        self.layers = torch.nn.ModuleList()
        for _ in range(cfg.depth):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(w, eps=eps)
            blk.q = torch.nn.Linear(w, w)
            blk.k = torch.nn.Linear(w, w, bias=False)
            blk.v = torch.nn.Linear(w, w)
            blk.inner_ln = torch.nn.LayerNorm(w, eps=eps)
            blk.out = torch.nn.Linear(w, w)
            blk.norm2 = torch.nn.LayerNorm(w, eps=eps)
            hidden = int(w * cfg.mlp_ratio)
            blk.fc1 = torch.nn.Linear(w, hidden)
            blk.ffn_ln = torch.nn.LayerNorm(hidden, eps=eps)
            blk.fc2 = torch.nn.Linear(hidden, w)
            self.layers.append(blk)
        self.final_ln = torch.nn.LayerNorm(w, eps=eps)

    def forward(self, images):
        cfg = self.cfg
        b = images.shape[0]
        x = self.patch(images).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos[2 : 2 + x.shape[1]].unsqueeze(0)
        H = cfg.num_heads
        for blk in self.layers:
            h = blk.norm1(x)
            B, N, D = h.shape

            def heads(t):
                return t.reshape(B, N, H, D // H).permute(0, 2, 1, 3)

            attn = (heads(blk.q(h)) * (D // H) ** -0.5) @ heads(
                blk.k(h)
            ).transpose(-2, -1)
            out = attn.softmax(dim=-1) @ heads(blk.v(h))
            out = out.permute(0, 2, 1, 3).reshape(B, N, D)
            x = x + blk.out(blk.inner_ln(out))
            h = blk.norm2(x)
            x = x + blk.fc2(blk.ffn_ln(F.gelu(blk.fc1(h))))
        return self.final_ln(x)[:, 0]

    def checkpoint(self):
        sd = {
            "beit3.vision_embed.proj.weight": _np(self.patch.weight),
            "beit3.vision_embed.proj.bias": _np(self.patch.bias),
            "beit3.vision_embed.cls_token": _np(self.cls_token),
            "beit3.encoder.embed_positions.A.weight": _np(self.pos),
            "beit3.encoder.layer_norm.A.weight": _np(self.final_ln.weight),
            "beit3.encoder.layer_norm.A.bias": _np(self.final_ln.bias),
        }
        for i, blk in enumerate(self.layers):
            p = f"beit3.encoder.layers.{i}."
            pairs = [
                ("self_attn_layer_norm.A", blk.norm1),
                ("self_attn.inner_attn_ln.A", blk.inner_ln),
                ("self_attn.q_proj.A", blk.q),
                ("self_attn.v_proj.A", blk.v),
                ("self_attn.out_proj.A", blk.out),
                ("final_layer_norm.A", blk.norm2),
                ("ffn.A.fc1", blk.fc1),
                ("ffn.A.ffn_layernorm", blk.ffn_ln),
                ("ffn.A.fc2", blk.fc2),
            ]
            for name, mod in pairs:
                sd[p + name + ".weight"] = _np(mod.weight)
                sd[p + name + ".bias"] = _np(mod.bias)
            sd[p + "self_attn.k_proj.A.weight"] = _np(blk.k.weight)
        return sd


def test_beit3_converter_matches_torch():
    cfg = Beit3Config(img_size=32, patch_size=16, width=32, depth=2, num_heads=4)
    torch.manual_seed(0)
    oracle = _TorchBeit3Tower(cfg).eval()
    images = torch.randn(2, 3, 32, 32)
    with torch.inference_mode():
        ref = oracle(images).numpy()

    variables = convert_beit3_state_dict(oracle.checkpoint(), cfg)
    ours = Beit3VisionTower(cfg).apply(
        variables, jnp.asarray(images.permute(0, 2, 3, 1).numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)


# ---------------------------------------------------------------------------
# TITAN slide encoder — 2-D-ALiBi ViT over patch features
# ---------------------------------------------------------------------------


class _TorchTitanViT(torch.nn.Module):
    """TITAN slide ViT layout (reference encoding/encoder/titan.py wraps the
    upstream equivalent): Linear patch_embed over CONCH1.5 features,
    timm-named blocks, geometric per-head ALiBi slopes penalizing Euclidean
    tile-grid distance, CLS row/col exempt."""

    def __init__(self, d_in, dim, depth, num_heads):
        super().__init__()
        self.dim, self.depth, self.num_heads = dim, depth, num_heads
        self.patch_embed = torch.nn.Linear(d_in, dim)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = torch.nn.ModuleList(
            [_make_packed_block(dim, 4 * dim, 1e-6) for _ in range(depth)]
        )
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, feats, grid):
        x = self.patch_embed(feats)
        x = torch.cat([self.cls_token[0], x], dim=0).unsqueeze(0)
        coords = grid.float()
        delta = coords[:, None, :] - coords[None, :, :]
        dist = torch.sqrt((delta**2).sum(-1) + 1e-12)
        dist = F.pad(dist, (1, 0, 1, 0))
        slopes = torch.tensor(
            [2.0 ** (-8.0 * (i + 1) / self.num_heads) for i in range(self.num_heads)]
        )
        bias = (-slopes[:, None, None] * dist[None]).unsqueeze(0)

        for blk in self.blocks:
            b, n, d = 1, x.shape[1], self.dim
            h = blk.norm1(x)
            qkv = blk.qkv(h).reshape(b, n, 3, self.num_heads, d // self.num_heads)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (d // self.num_heads) ** -0.5 + bias
            h = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, n, d)
            x = x + blk.proj(h)
            h = blk.norm2(x)
            x = x + blk.fc2(F.gelu(blk.fc1(h)))
        return self.norm(x)[0, 0]

    def checkpoint(self):
        sd = {
            "patch_embed.weight": _np(self.patch_embed.weight),
            "patch_embed.bias": _np(self.patch_embed.bias),
            "cls_token": _np(self.cls_token),
            "norm.weight": _np(self.norm.weight),
            "norm.bias": _np(self.norm.bias),
        }
        for i, blk in enumerate(self.blocks):
            _packed_block_sd(sd, f"blocks.{i}.", blk)
        return sd


def test_titan_converter_matches_torch():
    torch.manual_seed(0)
    oracle = _TorchTitanViT(d_in=24, dim=32, depth=2, num_heads=4).eval()
    feats = torch.randn(10, 24)
    grid = torch.randint(0, 6, (10, 2))
    with torch.inference_mode():
        ref = oracle(feats, grid).numpy()

    variables = convert_titan_state_dict(oracle.checkpoint(), depth=2)
    ours = TitanViT(dim=32, depth=2, num_heads=4).apply(
        variables, jnp.asarray(feats.numpy()), jnp.asarray(grid.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)


# ---------------------------------------------------------------------------
# GigaPath slide encoder — LongNetViT (torchscale layout)
# ---------------------------------------------------------------------------


def _torch_sincos(coords, dim):
    half, quarter = dim // 2, dim // 4
    freqs = 1.0 / (10000.0 ** (torch.arange(quarter, dtype=torch.float32) / quarter))

    def enc(pos):
        ang = pos[:, None] * freqs[None, :]
        return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)

    return torch.cat([enc(coords[:, 0]), enc(coords[:, 1])], dim=-1)


class _TorchLongNetViT(torch.nn.Module):
    """prov-gigapath slide encoder layout (torchscale encoder naming with
    separate q/k/v projections); attention per head-group is dilated: a
    token attends within its segment of length w to positions in the same
    sparse group (stride r) — reference encoding/encoder/gigapath.py wraps
    the upstream equivalent."""

    def __init__(self, d_in, dim, depth, num_heads, segments, dilations):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.segments, self.dilations = segments, dilations
        self.patch_embed = torch.nn.Linear(d_in, dim)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.layers = torch.nn.ModuleList()
        for _ in range(depth):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
            blk.q = torch.nn.Linear(dim, dim)
            blk.k = torch.nn.Linear(dim, dim)
            blk.v = torch.nn.Linear(dim, dim)
            blk.out = torch.nn.Linear(dim, dim)
            blk.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
            blk.fc1 = torch.nn.Linear(dim, 4 * dim)
            blk.fc2 = torch.nn.Linear(4 * dim, dim)
            self.layers.append(blk)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def _dilated(self, q, k, v):  # [H, L, hd]
        H, L, hd = q.shape
        n_cfg = len(self.segments)
        hc = H // n_cfg
        idx = torch.arange(L)
        outs = []
        for i, (w, r) in enumerate(zip(self.segments, self.dilations)):
            mask = ((idx[:, None] // w) == (idx[None, :] // w)) & (
                (idx[:, None] % r) == (idx[None, :] % r)
            )
            sl = slice(i * hc, (i + 1) * hc)
            logits = (q[sl] * hd**-0.5) @ k[sl].transpose(-2, -1)
            logits = logits.masked_fill(~mask, -1e30)
            outs.append(logits.softmax(dim=-1) @ v[sl])
        return torch.cat(outs, dim=0)

    def forward(self, feats, grid):
        x = self.patch_embed(feats) + _torch_sincos(grid.float(), self.dim)
        x = torch.cat([self.cls_token[0], x], dim=0)
        n = x.shape[0]
        hd = self.dim // self.num_heads
        for blk in self.layers:
            h = blk.norm1(x)

            def heads(t):
                return t.reshape(n, self.num_heads, hd).permute(1, 0, 2)

            out = self._dilated(heads(blk.q(h)), heads(blk.k(h)), heads(blk.v(h)))
            out = out.permute(1, 0, 2).reshape(n, self.dim)
            x = x + blk.out(out)
            h = blk.norm2(x)
            x = x + blk.fc2(F.gelu(blk.fc1(h)))
        return self.norm(x)[1:].mean(dim=0)

    def checkpoint(self):
        sd = {
            "patch_embed.weight": _np(self.patch_embed.weight),
            "patch_embed.bias": _np(self.patch_embed.bias),
            "cls_token": _np(self.cls_token),
            "encoder.layer_norm.weight": _np(self.norm.weight),
            "encoder.layer_norm.bias": _np(self.norm.bias),
        }
        for i, blk in enumerate(self.layers):
            p = f"encoder.layers.{i}."
            pairs = [
                ("self_attn_layer_norm", blk.norm1),
                ("self_attn.q_proj", blk.q),
                ("self_attn.k_proj", blk.k),
                ("self_attn.v_proj", blk.v),
                ("self_attn.out_proj", blk.out),
                ("final_layer_norm", blk.norm2),
                ("ffn.fc1", blk.fc1),
                ("ffn.fc2", blk.fc2),
            ]
            for name, mod in pairs:
                sd[p + name + ".weight"] = _np(mod.weight)
                sd[p + name + ".bias"] = _np(mod.bias)
        return sd


def test_gigapath_slide_converter_matches_torch():
    torch.manual_seed(0)
    # L = 15 tiles + CLS = 16 tokens: both (w=8, r=1) and (w=16, r=2)
    # configurations run unpadded, so the naive torch mask is exact
    segments, dilations = (8, 16), (1, 2)
    oracle = _TorchLongNetViT(
        d_in=24, dim=16, depth=2, num_heads=4, segments=segments, dilations=dilations
    ).eval()
    feats = torch.randn(15, 24)
    grid = torch.rand(15, 2) * 8
    with torch.inference_mode():
        ref = oracle(feats, grid).numpy()

    variables = convert_gigapath_slide_state_dict(oracle.checkpoint(), depth=2)
    ours = LongNetViT(
        dim=16, depth=2, num_heads=4, segment_lengths=segments, dilation_rates=dilations
    ).apply(variables, jnp.asarray(feats.numpy()), jnp.asarray(grid.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)


# ---------------------------------------------------------------------------
# PRISM — Perceiver resampler
# ---------------------------------------------------------------------------


class _TorchPrism(torch.nn.Module):
    """PRISM ``image_resampler`` layout: learned latents, a media input
    projection, per layer a latents←media cross-attention followed by a
    latent self-attention block; mean latent = ``image_embedding``
    (reference encoding/encoder/prism.py:27-47)."""

    def __init__(self, d_in, dim, n_latents, depth, num_heads):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.latents = torch.nn.Parameter(torch.randn(n_latents, dim) * 0.02)
        self.media_proj = torch.nn.Linear(d_in, dim)
        self.layers = torch.nn.ModuleList()
        for _ in range(depth):
            lyr = torch.nn.Module()
            lyr.cross_norm = torch.nn.LayerNorm(dim, eps=1e-6)
            lyr.cross_q = torch.nn.Linear(dim, dim)
            lyr.cross_k = torch.nn.Linear(dim, dim)
            lyr.cross_v = torch.nn.Linear(dim, dim)
            lyr.cross_proj = torch.nn.Linear(dim, dim)
            lyr.block = _make_packed_block(dim, 4 * dim, 1e-6)
            self.layers.append(lyr)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, feats):
        kv = self.media_proj(feats).unsqueeze(0)
        x = self.latents.unsqueeze(0)
        hd = self.dim // self.num_heads
        for lyr in self.layers:
            h = lyr.cross_norm(x)

            def heads(t):
                return t.reshape(1, -1, self.num_heads, hd).permute(0, 2, 1, 3)

            attn = (heads(lyr.cross_q(h)) * hd**-0.5) @ heads(
                lyr.cross_k(kv)
            ).transpose(-2, -1)
            out = attn.softmax(dim=-1) @ heads(lyr.cross_v(kv))
            out = out.permute(0, 2, 1, 3).reshape(1, -1, self.dim)
            x = x + lyr.cross_proj(out)
            x = _mha_block_forward(x, lyr.block, self.num_heads)
        return self.norm(x)[0].mean(dim=0)

    def checkpoint(self):
        sd = {
            "image_resampler.latents": _np(self.latents),
            "image_resampler.media_proj.weight": _np(self.media_proj.weight),
            "image_resampler.media_proj.bias": _np(self.media_proj.bias),
            "image_resampler.norm.weight": _np(self.norm.weight),
            "image_resampler.norm.bias": _np(self.norm.bias),
        }
        for i, lyr in enumerate(self.layers):
            p = f"image_resampler.layers.{i}."
            for name in ("cross_q", "cross_k", "cross_v", "cross_proj", "cross_norm"):
                mod = getattr(lyr, name)
                sd[p + name + ".weight"] = _np(mod.weight)
                sd[p + name + ".bias"] = _np(mod.bias)
            _packed_block_sd(sd, p, lyr.block)
        return sd


def test_prism_converter_matches_torch():
    torch.manual_seed(0)
    oracle = _TorchPrism(d_in=64, dim=32, n_latents=8, depth=2, num_heads=4).eval()
    feats = torch.randn(20, 64)
    with torch.inference_mode():
        ref = oracle(feats).numpy()

    variables = convert_prism_state_dict(oracle.checkpoint(), depth=2)
    ours = PrismPerceiver(
        dim=32, input_dim=64, num_latents=8, depth=2, num_heads=4
    ).apply(variables, jnp.asarray(feats.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)


# ---------------------------------------------------------------------------
# COBRA — Mamba2 mixer + gated-attention pooling (mamba-ssm layout)
# ---------------------------------------------------------------------------


class _TorchMamba2(torch.nn.Module):
    """mamba-ssm ``Mamba2`` layout: packed in_proj → [z, xBC, dt], causal
    depthwise conv1d over xBC, SSD recurrence (sequential here — the ground
    truth the chunked TPU kernel matches to 1e-6, tests/test_ops.py),
    gated RMSNorm, out_proj."""

    def __init__(self, d_model, d_state=128, d_conv=4, expand=2, headdim=64):
        super().__init__()
        self.d_model, self.d_state, self.headdim = d_model, d_state, headdim
        self.d_inner = expand * d_model
        self.nheads = self.d_inner // headdim
        conv_dim = self.d_inner + 2 * d_state
        self.in_proj = torch.nn.Linear(
            d_model, 2 * self.d_inner + 2 * d_state + self.nheads, bias=False
        )
        self.conv1d = torch.nn.Conv1d(
            conv_dim, conv_dim, d_conv, groups=conv_dim, padding=d_conv - 1
        )
        self.dt_bias = torch.nn.Parameter(torch.zeros(self.nheads))
        self.A_log = torch.nn.Parameter(
            torch.log(torch.arange(1, self.nheads + 1, dtype=torch.float32))
        )
        self.D = torch.nn.Parameter(torch.ones(self.nheads))
        self.norm = torch.nn.Module()
        self.norm.weight = torch.nn.Parameter(torch.ones(self.d_inner))
        self.out_proj = torch.nn.Linear(self.d_inner, d_model, bias=False)

    def forward(self, u):  # [L, d_model]
        L = u.shape[0]
        zxbcdt = self.in_proj(u)
        z, xbc, dt = torch.split(
            zxbcdt, [self.d_inner, self.d_inner + 2 * self.d_state, self.nheads], dim=-1
        )
        xbc = self.conv1d(xbc.T.unsqueeze(0))[0, :, :L].T  # causal (left-pad)
        xbc = F.silu(xbc)
        x, B, C = torch.split(
            xbc, [self.d_inner, self.d_state, self.d_state], dim=-1
        )
        dt = F.softplus(dt + self.dt_bias)  # [L, H]
        A = -torch.exp(self.A_log)  # [H]
        xh = x.reshape(L, self.nheads, self.headdim)

        h = torch.zeros(self.nheads, self.headdim, self.d_state)
        ys = []
        for t in range(L):
            decay = torch.exp(dt[t] * A)  # [H]
            h = h * decay[:, None, None] + (
                dt[t][:, None, None] * xh[t][:, :, None]
            ) * B[t][None, None, :]
            ys.append(torch.einsum("hpn,n->hp", h, C[t]))
        y = torch.stack(ys) + self.D[None, :, None] * xh
        y = y.reshape(L, self.d_inner)

        y = y * F.silu(z)
        y = y * torch.rsqrt(y.pow(2).mean(-1, keepdim=True) + 1e-5) * self.norm.weight
        return self.out_proj(y)


class _TorchCobra(torch.nn.Module):
    """COBRA layout: ``embed`` ModuleDict keyed by input dim, pre-LN Mamba2
    layers under ``mamba.layers``, final norm, CLAM-style gated attention;
    output = attention-weighted average of the *raw* tile features
    (reference encoding/encoder/cobra.py:26-64 wraps the upstream)."""

    def __init__(self, d_in, d_model, depth):
        super().__init__()
        self.embed = torch.nn.ModuleDict(
            {str(d_in): torch.nn.Linear(d_in, d_model)}
        )
        self.mamba_norms = torch.nn.ModuleList(
            [torch.nn.LayerNorm(d_model, eps=1e-6) for _ in range(depth)]
        )
        self.mixers = torch.nn.ModuleList(
            [_TorchMamba2(d_model) for _ in range(depth)]
        )
        self.norm = torch.nn.LayerNorm(d_model, eps=1e-6)
        self.attention_a = torch.nn.Linear(d_model, 384)
        self.attention_b = torch.nn.Linear(d_model, 384)
        self.attention_c = torch.nn.Linear(384, 1)
        self.d_in = d_in

    def forward(self, feats):
        x = self.embed[str(self.d_in)](feats)
        for norm, mixer in zip(self.mamba_norms, self.mixers):
            x = x + mixer(norm(x))
        h = self.norm(x)
        gate = torch.tanh(self.attention_a(h)) * torch.sigmoid(self.attention_b(h))
        weights = self.attention_c(gate)[:, 0].softmax(dim=0)
        return weights @ feats

    def checkpoint(self):
        sd = {
            f"embed.{self.d_in}.weight": _np(self.embed[str(self.d_in)].weight),
            f"embed.{self.d_in}.bias": _np(self.embed[str(self.d_in)].bias),
            "norm.weight": _np(self.norm.weight),
            "norm.bias": _np(self.norm.bias),
            "attention.attention_a.0.weight": _np(self.attention_a.weight),
            "attention.attention_a.0.bias": _np(self.attention_a.bias),
            "attention.attention_b.0.weight": _np(self.attention_b.weight),
            "attention.attention_b.0.bias": _np(self.attention_b.bias),
            "attention.attention_c.weight": _np(self.attention_c.weight),
            "attention.attention_c.bias": _np(self.attention_c.bias),
        }
        for i, (norm, mixer) in enumerate(zip(self.mamba_norms, self.mixers)):
            p = f"mamba.layers.{i}."
            sd[p + "norm.weight"] = _np(norm.weight)
            sd[p + "norm.bias"] = _np(norm.bias)
            sd[p + "mixer.in_proj.weight"] = _np(mixer.in_proj.weight)
            sd[p + "mixer.conv1d.weight"] = _np(mixer.conv1d.weight)
            sd[p + "mixer.conv1d.bias"] = _np(mixer.conv1d.bias)
            sd[p + "mixer.A_log"] = _np(mixer.A_log)
            sd[p + "mixer.D"] = _np(mixer.D)
            sd[p + "mixer.dt_bias"] = _np(mixer.dt_bias)
            sd[p + "mixer.norm.weight"] = _np(mixer.norm.weight)
            sd[p + "mixer.out_proj.weight"] = _np(mixer.out_proj.weight)
        return sd


def test_cobra_converter_matches_torch():
    torch.manual_seed(0)
    oracle = _TorchCobra(d_in=32, d_model=64, depth=2).eval()
    feats = torch.randn(24, 32)
    with torch.inference_mode():
        ref = oracle(feats).numpy()

    variables = convert_cobra_state_dict(oracle.checkpoint(), depth=2)
    ours = CobraNet(d_model=64, depth=2, input_dims=(32,)).apply(
        variables, jnp.asarray(feats.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)


# ---------------------------------------------------------------------------
# MADELEINE — multi-head gated-attention MIL
# ---------------------------------------------------------------------------


class _TorchMadeleine(torch.nn.Module):
    """MADELEINE layout: Linear→ReLU patch embedder, CLAM-style gated
    attention with one score per head, per-head softmax over tiles, pooled
    head-chunks concatenated and projected (reference
    encoding/encoder/madeleine.py:26-60 wraps the upstream)."""

    def __init__(self, d_in, dim, num_heads):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.pre = torch.nn.Linear(d_in, dim)
        self.attention_a = torch.nn.Linear(dim, dim)
        self.attention_b = torch.nn.Linear(dim, dim)
        self.attention_c = torch.nn.Linear(dim, num_heads)
        self.post = torch.nn.Linear(dim, dim)

    def forward(self, feats):
        h = F.relu(self.pre(feats))
        gate = torch.tanh(self.attention_a(h)) * torch.sigmoid(self.attention_b(h))
        weights = self.attention_c(gate).softmax(dim=0)  # [N, H]
        hd = self.dim // self.num_heads
        pooled = torch.einsum(
            "nh,nhd->hd", weights, h.reshape(-1, self.num_heads, hd)
        ).reshape(self.dim)
        return self.post(pooled)

    def checkpoint(self):
        return {
            "patch_embedder.0.weight": _np(self.pre.weight),
            "patch_embedder.0.bias": _np(self.pre.bias),
            "attention.attention_a.0.weight": _np(self.attention_a.weight),
            "attention.attention_a.0.bias": _np(self.attention_a.bias),
            "attention.attention_b.0.weight": _np(self.attention_b.weight),
            "attention.attention_b.0.bias": _np(self.attention_b.bias),
            "attention.attention_c.weight": _np(self.attention_c.weight),
            "attention.attention_c.bias": _np(self.attention_c.bias),
            "post_attention.weight": _np(self.post.weight),
            "post_attention.bias": _np(self.post.bias),
        }


def test_madeleine_converter_matches_torch():
    torch.manual_seed(0)
    oracle = _TorchMadeleine(d_in=48, dim=32, num_heads=4).eval()
    feats = torch.randn(24, 48)
    with torch.inference_mode():
        ref = oracle(feats).numpy()

    variables = convert_madeleine_state_dict(oracle.checkpoint())
    ours = MadeleineNet(dim=32, num_heads=4).apply(
        variables, jnp.asarray(feats.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3)
