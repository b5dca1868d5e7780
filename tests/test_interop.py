"""Reference-checkpoint interop tests.

Builds Lightning-style torch checkpoints with the reference's exact layout
(``state_dict`` with ``model.*`` keys per reference
src/stamp/modeling/models/vision_tranformer.py / mlp.py, ``hyper_parameters``
per models/__init__.py:60-110), loads them through the regular
``load_model_from_ckpt`` path, and checks forward parity against an
independently written torch oracle plus an end-to-end ``deploy`` run.
"""

import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn as nn

from stamp_tpu.modeling.deploy import deploy_categorical_model_, load_model_from_ckpt

from random_data import create_random_dataset


# ---------------------------------------------------------------------------
# Torch oracle of the reference MIL ViT (eval mode, no mask)
# ---------------------------------------------------------------------------


class _OracleALiBiHead(nn.Module):
    """One head: softmax(qk/√d) − (dist / running_mean) · bias_scale."""

    def __init__(self, dim: int, head_dim: int) -> None:
        super().__init__()
        self.q = nn.Linear(dim, head_dim)
        self.k = nn.Linear(dim, head_dim)
        self.v = nn.Linear(dim, head_dim)
        self.bias_scale = nn.Parameter(torch.rand(1))
        self.register_buffer("running_mean", torch.rand(1) + 0.5)
        self.register_buffer("items_so_far", torch.ones(1) + 3)

    def forward(self, x, coords):
        q, k, v = self.q(x), self.k(x), self.v(x)
        logits = torch.einsum("bqf,bkf->bqk", q, k) * (k.size(-1) ** -0.5)
        distances = torch.cdist(coords, coords)
        scaled = distances / self.running_mean * self.bias_scale
        weights = torch.softmax(logits, dim=-1) - scaled
        return torch.einsum("bqk,bkf->bqf", weights, v)


class _OracleAttention(nn.Module):
    def __init__(self, dim: int, n_heads: int, use_alibi: bool) -> None:
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.use_alibi = use_alibi
        if use_alibi:
            self.heads = nn.ModuleList(
                _OracleALiBiHead(dim, dim // n_heads) for _ in range(n_heads)
            )
            self.fc = nn.Linear(dim, dim)
        else:
            self.mha = nn.MultiheadAttention(dim, n_heads, 0.0, batch_first=True)

    def forward(self, x, coords):
        h = self.norm(x)
        if self.use_alibi:
            parts = [head(h, coords) for head in self.heads]
            stacked = torch.stack(parts)  # [H, B, T, hd]
            return self.fc(stacked.permute(1, 2, 0, 3).flatten(-2, -1))
        out, _ = self.mha(h, h, h, need_weights=False)
        return out


class _OracleFF(nn.Module):
    def __init__(self, dim: int, hidden: int) -> None:
        super().__init__()
        self.net = nn.Sequential(
            nn.LayerNorm(dim),
            nn.Linear(dim, hidden),
            nn.GELU(),
            nn.Dropout(0.0),
            nn.Linear(hidden, dim),
            nn.Dropout(0.0),
        )

    def forward(self, x):
        return self.net(x)


class _OracleViT(nn.Module):
    """Reference VisionTransformer forward, eval mode, mask=None."""

    def __init__(
        self,
        dim_input: int,
        dim_output: int,
        dim_model: int,
        n_layers: int,
        n_heads: int,
        dim_feedforward: int,
        use_alibi: bool,
    ) -> None:
        super().__init__()
        self.class_token = nn.Parameter(torch.randn(dim_model))
        self.project = nn.Sequential(
            nn.Linear(dim_input, dim_model), nn.GELU(), nn.Dropout(0.0)
        )
        self.blocks = nn.ModuleList(
            nn.ModuleList(
                [
                    _OracleAttention(dim_model, n_heads, use_alibi),
                    _OracleFF(dim_model, dim_feedforward),
                ]
            )
            for _ in range(n_layers)
        )
        self.final_norm = nn.LayerNorm(dim_model)
        self.head = nn.Linear(dim_model, dim_output)

    def forward(self, bags, coords):
        b = bags.shape[0]
        x = self.project(bags)
        cls = self.class_token.expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1)
        coords = torch.cat([torch.zeros(b, 1, 2).type_as(coords), coords], dim=1)
        for attn, ff in self.blocks:
            x = attn(x, coords) + x
            x = ff(x) + x
        x = self.final_norm(x)
        return self.head(x[:, 0])


def _vit_reference_state_dict(oracle: _OracleViT) -> dict:
    """Oracle params → the reference's exact state-dict key layout."""
    sd: dict = {"class_token": oracle.class_token.detach()}
    sd["project_features.0.weight"] = oracle.project[0].weight.detach()
    sd["project_features.0.bias"] = oracle.project[0].bias.detach()
    for i, (attn, ff) in enumerate(oracle.blocks):
        p = f"transformer.layers.{i}"
        sd[f"{p}.0.norm.weight"] = attn.norm.weight.detach()
        sd[f"{p}.0.norm.bias"] = attn.norm.bias.detach()
        if attn.use_alibi:
            for h, head in enumerate(attn.heads):
                a = f"{p}.0.mhsa"
                for name, lin in (("query", head.q), ("key", head.k), ("value", head.v)):
                    sd[f"{a}.{name}_encoders.{h}.weight"] = lin.weight.detach()
                    sd[f"{a}.{name}_encoders.{h}.bias"] = lin.bias.detach()
                sd[f"{a}.attentions.{h}.bias_scale"] = head.bias_scale.detach()
                sd[f"{a}.attentions.{h}.scale_distance.running_mean"] = (
                    head.running_mean.detach()
                )
                sd[f"{a}.attentions.{h}.scale_distance.items_so_far"] = (
                    head.items_so_far.detach()
                )
            sd[f"{p}.0.mhsa.fc.weight"] = attn.fc.weight.detach()
            sd[f"{p}.0.mhsa.fc.bias"] = attn.fc.bias.detach()
        else:
            sd[f"{p}.0.mhsa.in_proj_weight"] = attn.mha.in_proj_weight.detach()
            sd[f"{p}.0.mhsa.in_proj_bias"] = attn.mha.in_proj_bias.detach()
            sd[f"{p}.0.mhsa.out_proj.weight"] = attn.mha.out_proj.weight.detach()
            sd[f"{p}.0.mhsa.out_proj.bias"] = attn.mha.out_proj.bias.detach()
        sd[f"{p}.1.0.weight"] = ff.net[0].weight.detach()
        sd[f"{p}.1.0.bias"] = ff.net[0].bias.detach()
        sd[f"{p}.1.1.weight"] = ff.net[1].weight.detach()
        sd[f"{p}.1.1.bias"] = ff.net[1].bias.detach()
        sd[f"{p}.1.4.weight"] = ff.net[4].weight.detach()
        sd[f"{p}.1.4.bias"] = ff.net[4].bias.detach()
    sd["transformer.norm.weight"] = oracle.final_norm.weight.detach()
    sd["transformer.norm.bias"] = oracle.final_norm.bias.detach()
    sd["mlp_head.0.weight"] = oracle.head.weight.detach()
    sd["mlp_head.0.bias"] = oracle.head.bias.detach()
    return sd


def _save_lightning_ckpt(path, state_dict: dict, hparams: dict) -> None:
    from packaging.version import Version

    ckpt = {
        "state_dict": {f"model.{k}": v for k, v in state_dict.items()},
        "hyper_parameters": {"stamp_version": Version("2.5.0"), **hparams},
        "epoch": 3,
        "global_step": 42,
    }
    torch.save(ckpt, path)


def _vit_hparams(dim_input: int, use_alibi: bool, cats=("neg", "pos")) -> dict:
    return {
        "task": "classification",
        "supported_features": "tile",
        "model_name": "vit",
        "ground_truth_label": "ground-truth",
        "categories": list(cats),
        "category_weights": torch.tensor([0.4, 0.6]),
        "dim_input": dim_input,
        "dim_model": 32,
        "n_layers": 2,
        "n_heads": 4,
        "dim_feedforward": 48,
        "dropout": 0.0,
        "use_alibi": use_alibi,
        "total_steps": 64,
        "max_lr": 1e-4,
        "div_factor": 25.0,
        "train_patients": ["p1", "p2"],
        "valid_patients": ["p3"],
    }


@pytest.mark.parametrize("use_alibi", [False, True])
def test_reference_vit_ckpt_forward_parity(tmp_path, use_alibi):
    torch.manual_seed(0)
    dim_input = 24
    oracle = _OracleViT(dim_input, 2, 32, 2, 4, 48, use_alibi).eval()

    ckpt_path = tmp_path / "model.ckpt"
    _save_lightning_ckpt(
        ckpt_path,
        _vit_reference_state_dict(oracle),
        _vit_hparams(dim_input, use_alibi),
    )

    model, variables = load_model_from_ckpt(ckpt_path)
    assert model.categories == ["neg", "pos"]

    rng = np.random.default_rng(0)
    bags = rng.normal(size=(2, 15, dim_input)).astype(np.float32)
    coords = (rng.uniform(size=(2, 15, 2)) * 2000).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.from_numpy(bags), torch.from_numpy(coords)).numpy()
    got = np.asarray(
        model.module.apply(variables, bags, coords=coords, train=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_reference_mlp_ckpt_forward_parity(tmp_path):
    torch.manual_seed(1)
    dim_input, dim_hidden, num_layers = 12, 20, 3
    oracle = nn.Sequential(
        nn.Linear(dim_input, dim_hidden),
        nn.ReLU(),
        nn.Dropout(0.0),
        nn.Linear(dim_hidden, dim_hidden),
        nn.ReLU(),
        nn.Dropout(0.0),
        nn.Linear(dim_hidden, 2),
    ).eval()
    sd = {f"mlp.{i}.{p}": t.detach() for i, m in enumerate(oracle)
          if isinstance(m, nn.Linear) for p, t in m.named_parameters()}
    hparams = {
        "task": "classification",
        "supported_features": "slide",
        "model_name": "mlp",
        "ground_truth_label": "ground-truth",
        "categories": ["neg", "pos"],
        "category_weights": torch.tensor([0.5, 0.5]),
        "dim_input": dim_input,
        "dim_hidden": dim_hidden,
        "num_layers": num_layers,
        "dropout": 0.0,
        "total_steps": 64,
        "max_lr": 1e-4,
        "div_factor": 25.0,
    }
    ckpt_path = tmp_path / "model.ckpt"
    _save_lightning_ckpt(ckpt_path, sd, hparams)

    model, variables = load_model_from_ckpt(ckpt_path)
    x = np.random.default_rng(0).normal(size=(4, dim_input)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(model.module.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_reference_ckpt_rejects_unsupported_backbone(tmp_path):
    """A backbone name outside the reference's registry (registry.py:40-72)
    is rejected loudly by name — no silent architecture guess."""
    ckpt_path = tmp_path / "model.ckpt"
    _save_lightning_ckpt(
        ckpt_path,
        {"dummy.weight": torch.zeros(1)},
        {**_vit_hparams(8, False), "model_name": "cobra"},
    )
    with pytest.raises(ValueError, match="cobra"):
        load_model_from_ckpt(ckpt_path)


def test_reference_ckpt_version_gate(tmp_path):
    from packaging.version import Version

    torch.manual_seed(0)
    oracle = _OracleViT(8, 2, 32, 2, 4, 48, False).eval()
    ckpt_path = tmp_path / "model.ckpt"
    hp = _vit_hparams(8, False)
    hp["stamp_version"] = Version("2.4.0")
    _save_lightning_ckpt(ckpt_path, _vit_reference_state_dict(oracle), hp)
    with pytest.raises(ValueError, match="incompatible"):
        load_model_from_ckpt(ckpt_path)


@pytest.mark.slow
def test_reference_ckpt_deploys_end_to_end(tmp_path):
    """A reference-format checkpoint drives `stamp deploy` unchanged:
    patient-preds.csv comes out with the standard column contract."""
    torch.manual_seed(0)
    dim_input = 16
    cats = ("neg", "pos")
    oracle = _OracleViT(dim_input, len(cats), 32, 2, 4, 48, True).eval()
    ckpt_path = tmp_path / "model.ckpt"
    _save_lightning_ckpt(
        ckpt_path,
        _vit_reference_state_dict(oracle),
        _vit_hparams(dim_input, True, cats),
    )

    (tmp_path / "data").mkdir()
    clini, slide, feats, _cats = create_random_dataset(
        dir=tmp_path / "data",
        feat_dim=dim_input,
        n_patients=6,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=24,
        categories=list(cats),
    )
    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[ckpt_path],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label="ground-truth",
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    df = pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")
    assert len(df) == 6
    score_cols = [f"ground-truth_{c}" for c in cats]
    assert ((df[score_cols].sum(axis=1) - 1).abs() < 1e-5).all()


# ---------------------------------------------------------------------------
# Export direction (repo → reference Lightning format)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_alibi", [False, True])
def test_export_roundtrip(tmp_path, use_alibi):
    """export(load(ckpt)) reproduces the reference checkpoint exactly: same
    state-dict keys, equal tensors, and an equal forward after re-loading."""
    from stamp_tpu.modeling.interop import save_reference_checkpoint

    torch.manual_seed(0)
    dim_input = 24
    oracle = _OracleViT(dim_input, 2, 32, 2, 4, 48, use_alibi).eval()
    src = tmp_path / "ref.ckpt"
    _save_lightning_ckpt(
        src, _vit_reference_state_dict(oracle), _vit_hparams(dim_input, use_alibi)
    )

    model, variables = load_model_from_ckpt(src)
    dst = tmp_path / "exported.ckpt"
    save_reference_checkpoint(
        dst, hyper_parameters=model.checkpoint_hparams(), variables=variables
    )

    want = torch.load(src, map_location="cpu", weights_only=False)
    got = torch.load(dst, map_location="cpu", weights_only=False)
    assert set(got["state_dict"]) == set(want["state_dict"])
    for k, v in want["state_dict"].items():
        np.testing.assert_allclose(
            got["state_dict"][k].numpy(), v.numpy(), atol=1e-6,
            err_msg=k,
        )
    assert "pytorch-lightning_version" in got
    hp = got["hyper_parameters"]
    assert hp["model_name"] == "vit"
    assert isinstance(hp["category_weights"], torch.Tensor)

    # the exported file loads back through the same interop path
    model2, variables2 = load_model_from_ckpt(dst)
    rng = np.random.default_rng(0)
    bags = rng.normal(size=(2, 15, dim_input)).astype(np.float32)
    coords = (rng.uniform(size=(2, 15, 2)) * 2000).astype(np.float32)
    a = np.asarray(model.module.apply(variables, bags, coords=coords, train=False))
    b = np.asarray(model2.module.apply(variables2, bags, coords=coords, train=False))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_export_repo_trained_checkpoint(tmp_path):
    """A checkpoint trained by THIS framework (npz) converts to a
    reference-deployable Lightning file via export_reference_checkpoint."""
    import jax

    from stamp_tpu.modeling.checkpoint import save_checkpoint
    from stamp_tpu.modeling.interop import export_reference_checkpoint
    from stamp_tpu.modeling.tasks import LitTileClassifier
    from stamp_tpu.models.vision_transformer import VisionTransformer

    model = LitTileClassifier(
        model_class=VisionTransformer,
        ground_truth_label="gt",
        categories=["neg", "pos"],
        category_weights=np.array([0.5, 0.5], np.float32),
        dim_input=16,
        model_name="vit",
        dim_model=32,
        dim_feedforward=48,
        n_heads=4,
        n_layers=2,
        use_alibi=True,
        total_steps=8,
    )
    rng = np.random.default_rng(0)
    batch = (
        rng.normal(size=(2, 8, 16)).astype(np.float32),
        (rng.uniform(size=(2, 8, 2)) * 100).astype(np.float32),
        np.array([8, 8], np.int32),
        np.zeros((2, 2), np.float32),
    )
    variables = model.init_variables(jax.random.PRNGKey(0), batch)

    npz = tmp_path / "model.ckpt"
    save_checkpoint(npz, hyper_parameters=model.checkpoint_hparams(), variables=variables)
    out = tmp_path / "model.lightning.ckpt"
    export_reference_checkpoint(npz, out)

    model2, variables2 = load_model_from_ckpt(out)
    a = np.asarray(
        model.module.apply(variables, batch[0], coords=batch[1], train=False)
    )
    b = np.asarray(
        model2.module.apply(variables2, batch[0], coords=batch[1], train=False)
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------------------
# TransMIL interop (Nyström attention backbone)
# ---------------------------------------------------------------------------


def _mp_pinv(x: torch.Tensor, iters: int = 6) -> torch.Tensor:
    z = x.transpose(-1, -2) / (x.abs().sum(-1).max() * x.abs().sum(-2).max())
    ident = torch.eye(x.shape[-1]).expand_as(x)
    for _ in range(iters):
        xz = x @ z
        z = 0.25 * z @ (13 * ident - xz @ (15 * ident - xz @ (7 * ident - xz)))
    return z


class _OracleNystrom(nn.Module):
    """Independent torch statement of the reference Nyström attention
    (trans_mil.py:43-167): left-pad to a landmark multiple, sum-pooled
    landmarks, three softmax kernels bridged by an iterative pinv, plus a
    depthwise residual conv over the value heads."""

    def __init__(self, dim: int, heads: int = 8) -> None:
        super().__init__()
        self.heads, self.dim_head = heads, dim // heads
        self.landmarks = dim // 2
        self.to_qkv = nn.Linear(dim, dim * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(dim, dim), nn.Dropout(0.0))
        self.res_conv = nn.Conv2d(heads, heads, (33, 1), padding=(16, 0),
                                  groups=heads, bias=False)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        b, n, _ = x.shape
        m, h, dh = self.landmarks, self.heads, self.dim_head
        if n % m:
            x = torch.nn.functional.pad(x, (0, 0, m - n % m, 0))
        np_ = x.shape[1]
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (t.view(b, np_, h, dh).permute(0, 2, 1, 3) for t in (q, k, v))
        q = q * dh**-0.5
        lsz = (n + m - 1) // m  # ceil(n / m), the landmark pool width
        ql = q.view(b, h, np_ // lsz, lsz, dh).sum(3) / lsz
        kl = k.view(b, h, np_ // lsz, lsz, dh).sum(3) / lsz
        s1 = torch.einsum("bhid,bhjd->bhij", q, kl).softmax(-1)
        s2 = torch.einsum("bhid,bhjd->bhij", ql, kl).softmax(-1)
        s3 = torch.einsum("bhid,bhjd->bhij", ql, k).softmax(-1)
        out = (s1 @ _mp_pinv(s2)) @ (s3 @ v) + self.res_conv(v)
        out = out.permute(0, 2, 1, 3).reshape(b, np_, h * dh)
        return self.to_out(out)[:, -n:]


class _OracleTransMIL(nn.Module):
    def __init__(self, dim_input: int, dim_hidden: int, n_out: int) -> None:
        super().__init__()
        self._fc1 = nn.Sequential(nn.Linear(dim_input, dim_hidden), nn.ReLU())
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim_hidden))
        self.layer1 = _OracleTransLayer(dim_hidden)
        self.layer2 = _OracleTransLayer(dim_hidden)
        self.pos_layer = _OraclePPEG(dim_hidden)
        self.norm = nn.LayerNorm(dim_hidden)
        self._fc2 = nn.Linear(dim_hidden, n_out)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        h = self._fc1(x)
        b, n, _ = h.shape
        side = int(np.ceil(np.sqrt(n)))
        h = torch.cat([h, h[:, : side * side - n]], dim=1)
        h = torch.cat([self.cls_token.expand(b, -1, -1), h], dim=1)
        h = self.layer1(h)
        h = self.pos_layer(h, side, side)
        h = self.layer2(h)
        return self._fc2(self.norm(h)[:, 0])


class _OracleTransLayer(nn.Module):
    def __init__(self, dim: int) -> None:
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.attn = _OracleNystrom(dim)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return x + self.attn(self.norm(x))


class _OraclePPEG(nn.Module):
    def __init__(self, dim: int) -> None:
        super().__init__()
        self.proj = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim)
        self.proj1 = nn.Conv2d(dim, dim, 5, 1, 2, groups=dim)
        self.proj2 = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x: torch.Tensor, H: int, W: int) -> torch.Tensor:
        cls, feat = x[:, :1], x[:, 1:]
        img = feat.transpose(1, 2).reshape(x.shape[0], -1, H, W)
        out = self.proj(img) + img + self.proj1(img) + self.proj2(img)
        return torch.cat([cls, out.flatten(2).transpose(1, 2)], dim=1)


def _trans_mil_hparams(dim_input: int, dim_hidden: int, cats=("neg", "pos")) -> dict:
    return {
        "task": "classification",
        "supported_features": "tile",
        "model_name": "trans_mil",
        "ground_truth_label": "ground-truth",
        "categories": list(cats),
        "category_weights": torch.tensor([0.5, 0.5]),
        "dim_input": dim_input,
        "dim_hidden": dim_hidden,
        "total_steps": 64,
        "max_lr": 1e-4,
        "div_factor": 25.0,
    }


def test_reference_trans_mil_ckpt_forward_parity(tmp_path):
    torch.manual_seed(0)
    dim_input, dim_hidden = 12, 32
    oracle = _OracleTransMIL(dim_input, dim_hidden, 2).eval()
    sd = {k: v.detach() for k, v in oracle.state_dict().items()}

    ckpt_path = tmp_path / "model.ckpt"
    _save_lightning_ckpt(ckpt_path, sd, _trans_mil_hparams(dim_input, dim_hidden))

    model, variables = load_model_from_ckpt(ckpt_path)
    rng = np.random.default_rng(0)
    bags = rng.normal(size=(2, 21, dim_input)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(bags)).numpy()
    got = np.asarray(model.module.apply(variables, bags, train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_export_trans_mil_roundtrip(tmp_path):
    from stamp_tpu.modeling.interop import save_reference_checkpoint

    torch.manual_seed(1)
    dim_input, dim_hidden = 12, 32
    oracle = _OracleTransMIL(dim_input, dim_hidden, 2).eval()
    src = tmp_path / "ref.ckpt"
    _save_lightning_ckpt(
        src,
        {k: v.detach() for k, v in oracle.state_dict().items()},
        _trans_mil_hparams(dim_input, dim_hidden),
    )
    model, variables = load_model_from_ckpt(src)
    dst = tmp_path / "exported.ckpt"
    save_reference_checkpoint(
        dst, hyper_parameters=model.checkpoint_hparams(), variables=variables
    )
    want = torch.load(src, map_location="cpu", weights_only=False)["state_dict"]
    got = torch.load(dst, map_location="cpu", weights_only=False)["state_dict"]
    assert set(got) == set(want)
    for k, v in want.items():
        np.testing.assert_allclose(got[k].numpy(), v.numpy(), atol=1e-6, err_msg=k)


def test_reference_survival_ckpt_loads_with_cutoff(tmp_path):
    """The interop path is task-agnostic: a survival vit checkpoint carries
    time/status labels and the deploy risk cut-off (train_pred_median,
    reference models/__init__.py:707-723) through to the task wrapper."""
    torch.manual_seed(3)
    dim_input = 16
    oracle = _OracleViT(dim_input, 1, 32, 2, 4, 48, False).eval()
    hp = {
        "task": "survival",
        "supported_features": "tile",
        "model_name": "vit",
        "time_label": "months",
        "status_label": "event",
        "method": "cox",
        "dim_input": dim_input,
        "dim_model": 32,
        "n_layers": 2,
        "n_heads": 4,
        "dim_feedforward": 48,
        "dropout": 0.0,
        "use_alibi": False,
        "total_steps": 64,
        "max_lr": 1e-4,
        "div_factor": 25.0,
        "train_pred_median": 0.125,
    }
    ckpt_path = tmp_path / "model.ckpt"
    _save_lightning_ckpt(ckpt_path, _vit_reference_state_dict(oracle), hp)

    model, variables = load_model_from_ckpt(ckpt_path)
    assert model.task_name == "survival"
    assert model.time_label == "months"
    assert model.status_label == "event"
    assert model.train_pred_median == 0.125

    rng = np.random.default_rng(0)
    bags = rng.normal(size=(2, 9, dim_input)).astype(np.float32)
    coords = (rng.uniform(size=(2, 9, 2)) * 500).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(bags), torch.from_numpy(coords)).numpy()
    got = np.asarray(
        model.module.apply(variables, bags, coords=coords, train=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # and it survives the export round-trip with the cut-off intact
    from stamp_tpu.modeling.interop import save_reference_checkpoint

    dst = tmp_path / "exported.ckpt"
    save_reference_checkpoint(
        dst, hyper_parameters=model.checkpoint_hparams(), variables=variables
    )
    model2, _ = load_model_from_ckpt(dst)
    assert model2.train_pred_median == 0.125


# ---------------------------------------------------------------------------
# barspoon (EncDecTransformer) interop — reference barspoon.py:104-205,
# registry.py:60-66, models/__init__.py:857-937
# ---------------------------------------------------------------------------


class _OracleEncDec(nn.Module):
    """Torch oracle mirroring the reference EncDecTransformer exactly
    (reference barspoon.py:104-205): projector → sinusoidal positional
    encodings → nn.TransformerEncoder → decoder over per-target class
    tokens → per-target heads."""

    def __init__(
        self,
        d_features: int,
        target_n_outs: dict[str, int],
        d_model: int = 32,
        n_heads: int = 4,
        n_enc: int = 2,
        n_dec: int = 2,
        dim_feedforward: int = 48,
    ) -> None:
        super().__init__()
        self.projector = nn.Sequential(nn.Linear(d_features, d_model), nn.ReLU())
        enc_layer = nn.TransformerEncoderLayer(
            d_model, n_heads, dim_feedforward, batch_first=True, norm_first=True
        )
        self.transformer_encoder = nn.TransformerEncoder(
            enc_layer, num_layers=n_enc, enable_nested_tensor=False
        )
        self.target_labels = list(target_n_outs)
        self.class_tokens = nn.ParameterDict(
            {t: torch.rand(d_model) for t in target_n_outs}
        )
        dec_layer = nn.TransformerDecoderLayer(
            d_model, n_heads, dim_feedforward, batch_first=True, norm_first=True
        )
        self.transformer_decoder = nn.TransformerDecoder(dec_layer, num_layers=n_dec)
        self.heads = nn.ModuleDict(
            {t: nn.Linear(d_model, n) for t, n in target_n_outs.items()}
        )

    def forward(self, tile_tokens, tile_positions):
        batch_size = tile_tokens.shape[0]
        x = self.projector(tile_tokens)
        d_model = x.size(-1)
        pe_in = tile_positions.unsqueeze(-1) / 100_000 ** (
            torch.arange(d_model // 4).type_as(tile_positions) / d_model
        )
        pe = torch.cat(
            [
                torch.sin(pe_in).flatten(start_dim=-2),
                torch.cos(pe_in).flatten(start_dim=-2),
            ],
            dim=-1,
        )
        x = self.transformer_encoder(x + pe)
        class_tokens = torch.stack(
            [self.class_tokens[t] for t in self.target_labels]
        ).expand(batch_size, -1, -1)
        class_tokens = self.transformer_decoder(tgt=class_tokens, memory=x)
        return {
            t: self.heads[t](tok)
            for t, tok in zip(self.target_labels, class_tokens.permute(1, 0, 2))
        }


_BARSPOON_TARGETS = {"msi": ["neg", "pos"], "grade_x": ["g1", "g2", "g3"]}


def _barspoon_hparams(dim_input: int) -> dict:
    return {
        "task": "classification",
        "supported_features": "tile",
        "model_name": "barspoon",
        "ground_truth_label": list(_BARSPOON_TARGETS),
        "categories": {t: list(c) for t, c in _BARSPOON_TARGETS.items()},
        "category_weights": {
            t: torch.ones(len(c)) / len(c) for t, c in _BARSPOON_TARGETS.items()
        },
        "dim_input": dim_input,
        "d_model": 32,
        "num_encoder_heads": 4,
        "num_decoder_heads": 4,
        "num_encoder_layers": 2,
        "num_decoder_layers": 2,
        "dim_feedforward": 48,
        "positional_encoding": True,
        "learning_rate": 1e-4,
        "train_patients": ["p1", "p2"],
        "valid_patients": ["p3"],
    }


def test_reference_barspoon_ckpt_forward_parity(tmp_path):
    torch.manual_seed(3)
    dim_input = 24
    oracle = _OracleEncDec(
        dim_input, {t: len(c) for t, c in _BARSPOON_TARGETS.items()}
    ).eval()

    ckpt_path = tmp_path / "model.ckpt"
    sd = {k: v.detach() for k, v in oracle.state_dict().items()}
    _save_lightning_ckpt(ckpt_path, sd, _barspoon_hparams(dim_input))

    model, variables = load_model_from_ckpt(ckpt_path)
    assert model.categories == {t: list(c) for t, c in _BARSPOON_TARGETS.items()}

    rng = np.random.default_rng(0)
    bags = rng.normal(size=(2, 15, dim_input)).astype(np.float32)
    coords = (rng.uniform(size=(2, 15, 2)) * 2000).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.from_numpy(bags), torch.from_numpy(coords))
    got = model.module.apply(variables, bags, coords=coords, train=False)
    assert set(got) == set(want)
    for t in want:
        np.testing.assert_allclose(
            np.asarray(got[t]), want[t].numpy(), atol=1e-4, rtol=1e-4,
            err_msg=t,
        )


def test_export_barspoon_roundtrip(tmp_path):
    """export(load(ckpt)) reproduces a reference barspoon checkpoint: same
    state-dict keys, equal tensors, equal forward after re-loading."""
    from stamp_tpu.modeling.interop import save_reference_checkpoint

    torch.manual_seed(4)
    dim_input = 24
    oracle = _OracleEncDec(
        dim_input, {t: len(c) for t, c in _BARSPOON_TARGETS.items()}
    ).eval()
    src = tmp_path / "ref.ckpt"
    sd = {k: v.detach() for k, v in oracle.state_dict().items()}
    _save_lightning_ckpt(src, sd, _barspoon_hparams(dim_input))

    model, variables = load_model_from_ckpt(src)
    dst = tmp_path / "exported.ckpt"
    save_reference_checkpoint(
        dst, hyper_parameters=model.checkpoint_hparams(), variables=variables
    )

    want = torch.load(src, map_location="cpu", weights_only=False)
    got = torch.load(dst, map_location="cpu", weights_only=False)
    assert set(got["state_dict"]) == set(want["state_dict"])
    for k, v in want["state_dict"].items():
        np.testing.assert_allclose(
            got["state_dict"][k].numpy(), v.numpy(), atol=1e-6, err_msg=k
        )
    hp = got["hyper_parameters"]
    assert hp["model_name"] == "barspoon"
    assert isinstance(hp["category_weights"], dict)
    assert all(isinstance(w, torch.Tensor) for w in hp["category_weights"].values())

    model2, variables2 = load_model_from_ckpt(dst)
    rng = np.random.default_rng(1)
    bags = rng.normal(size=(2, 11, dim_input)).astype(np.float32)
    coords = (rng.uniform(size=(2, 11, 2)) * 1000).astype(np.float32)
    a = model.module.apply(variables, bags, coords=coords, train=False)
    b = model2.module.apply(variables2, bags, coords=coords, train=False)
    for t in a:
        np.testing.assert_allclose(
            np.asarray(a[t]), np.asarray(b[t]), atol=1e-6, err_msg=t
        )


def test_export_repo_trained_barspoon_checkpoint(tmp_path):
    """A barspoon model trained by THIS framework exports to a
    reference-deployable Lightning checkpoint (npz → .ckpt → load)."""
    import jax

    from stamp_tpu.modeling.checkpoint import save_checkpoint
    from stamp_tpu.modeling.interop import export_reference_checkpoint
    from stamp_tpu.modeling.tasks import LitEncDecTransformer

    model = LitEncDecTransformer(
        dim_input=16,
        ground_truth_label=list(_BARSPOON_TARGETS),
        categories={t: list(c) for t, c in _BARSPOON_TARGETS.items()},
        category_weights={
            t: np.ones(len(c), np.float32) / len(c)
            for t, c in _BARSPOON_TARGETS.items()
        },
        d_model=32,
        num_encoder_heads=4,
        num_decoder_heads=4,
        dim_feedforward=48,
        model_name="barspoon",
    )
    rng = np.random.default_rng(0)
    batch = (
        rng.normal(size=(2, 8, 16)).astype(np.float32),
        (rng.uniform(size=(2, 8, 2)) * 100).astype(np.float32),
        np.array([8, 8], np.int32),
        {
            t: np.zeros((2, len(c)), np.float32)
            for t, c in _BARSPOON_TARGETS.items()
        },
    )
    variables = model.init_variables(jax.random.PRNGKey(0), batch)

    npz = tmp_path / "model.ckpt"
    save_checkpoint(
        npz, hyper_parameters=model.checkpoint_hparams(), variables=variables
    )
    out = tmp_path / "model.lightning.ckpt"
    export_reference_checkpoint(npz, out)

    model2, variables2 = load_model_from_ckpt(out)
    a = model.module.apply(variables, batch[0], coords=batch[1], train=False)
    b = model2.module.apply(variables2, batch[0], coords=batch[1], train=False)
    for t in a:
        np.testing.assert_allclose(
            np.asarray(a[t]), np.asarray(b[t]), atol=1e-5, err_msg=t
        )


def test_reference_barspoon_ckpt_deploys_end_to_end(tmp_path):
    """A reference-format BARSPOON checkpoint drives multi-target
    `stamp deploy` unchanged: per-target prediction columns with softmax
    rows (reference deploy.py:49-58 + barspoon predict_step semantics)."""
    from random_data import create_random_multi_target_dataset

    torch.manual_seed(6)
    dim_input = 24
    oracle = _OracleEncDec(
        dim_input, {t: len(c) for t, c in _BARSPOON_TARGETS.items()}
    ).eval()
    ckpt_path = tmp_path / "model.ckpt"
    sd = {k: v.detach() for k, v in oracle.state_dict().items()}
    _save_lightning_ckpt(ckpt_path, sd, _barspoon_hparams(dim_input))

    (tmp_path / "data").mkdir()
    clini, slide, feats, _ = create_random_multi_target_dataset(
        dir=tmp_path / "data",
        n_patients=6,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=24,
        feat_dim=dim_input,
        target_labels=list(_BARSPOON_TARGETS),
        categories_per_target=[list(c) for c in _BARSPOON_TARGETS.values()],
    )
    deploy_categorical_model_(
        output_dir=tmp_path / "deploy",
        checkpoint_paths=[ckpt_path],
        clini_table=clini,
        slide_table=slide,
        feature_dir=feats,
        ground_truth_label=list(_BARSPOON_TARGETS),
        time_label=None,
        status_label=None,
        patient_label="patient",
        filename_label="slide_path",
        num_workers=1,
        accelerator="cpu",
    )
    df = pd.read_csv(tmp_path / "deploy" / "patient-preds.csv")
    assert len(df) == 6
    for t, cats in _BARSPOON_TARGETS.items():
        assert f"pred_{t}" in df.columns
        score_cols = [f"{t}_{c}" for c in cats]
        assert ((df[score_cols].sum(axis=1) - 1).abs() < 1e-5).all()
