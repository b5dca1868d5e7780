"""Grad-CAM heatmaps and top-tile export.

Behavioral port of reference src/stamp/heatmaps/__init__.py: per-slide
Jacobian Grad-CAM per category (``jax.jacrev`` in place of
``torch.func.jacrev``, heatmaps/__init__.py:36-56), per-tile softmax scores
via a vmapped bag-of-one forward (417-430), category-support diverging
colormaps (464-525), classification/regression/survival branches, and
top-/bottom-k tile crops read back from the WSI (190-239).
"""

from __future__ import annotations

import logging
from collections.abc import Collection, Iterable
from dataclasses import dataclass, replace as dc_replace
from functools import partial
from pathlib import Path
from typing import cast

import h5py
import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.patches import Patch
from packaging.version import Version
from PIL import Image

from stamp_tpu.io.h5 import get_coords, get_stride
from stamp_tpu.modeling.deploy import load_model_from_ckpt
from stamp_tpu.preprocessing.wsi import get_slide_mpp_, open_slide
from stamp_tpu.types import Microns, SlideMPP, TilePixels

_logger = logging.getLogger("stamp")

supported_extensions = {
    ".czi", ".svs", ".tif", ".vms", ".vmu", ".ndpi", ".scn", ".mrxs",
    ".tiff", ".svslide", ".bif", ".qptiff", ".png", ".jpg", ".jpeg",
}  # fmt: skip


def _debatch(out, target: str | None):
    """Select a multi-target head (barspoon dict output) and drop the
    batch axis; with ``target=None`` a dict stays a dict, per target."""
    if target is not None:
        out = out[target]
    if isinstance(out, dict):
        return {k: v[0] for k, v in out.items()}
    return out[0]


def _forward_fn(model, variables, target: str | None = None):
    """Whole-bag forward.  For multi-target models (barspoon) pass
    ``target`` to select one head's logits; with ``target=None`` a dict
    output is returned per target (each de-batched)."""
    module = model.module
    uses_coords = model.uses_coords

    def fwd(feats, coords):
        kwargs: dict = dict(train=False)
        if uses_coords:
            kwargs.update(coords=coords[None], key_mask=None)
        return _debatch(module.apply(variables, feats[None], **kwargs), target)

    return fwd


def _gradcam_per_category(
    model, variables, feats: np.ndarray, coords: np.ndarray,
    target: str | None = None,
) -> np.ndarray:
    """[tile, category] Grad-CAM scores (reference heatmaps/__init__.py:36-56)."""
    fwd = _forward_fn(model, variables, target)
    coords_j = jnp.asarray(coords)
    jac = jax.jacrev(lambda f: fwd(f, coords_j))(jnp.asarray(feats))
    # jac: [category, tile, feature]
    cam = jnp.abs((jnp.asarray(feats)[None] * jac).mean(-1))  # [category, tile]
    cam = jax.nn.softmax(cam, axis=-1)
    return np.asarray(cam.T)  # [tile, category]


def _gradcam_single(
    model, variables, feats: np.ndarray, coords: np.ndarray
) -> np.ndarray:
    """[tile] relevance for single-output models (heatmaps/__init__.py:115-139)."""
    fwd = _forward_fn(model, variables)
    coords_j = jnp.asarray(coords)
    jac = jax.jacrev(lambda f: fwd(f, coords_j).squeeze())(jnp.asarray(feats))
    cam = jnp.abs((jnp.asarray(feats) * jac).mean(-1))
    return np.asarray(cam)


STREAMING_ROLLOUT_MIN_SEQ = 4096


@partial(jax.jit, static_argnames=("block",))
def _rollout_row_step(r: jax.Array, q: jax.Array, k: jax.Array, *, block: int = 256):
    """One rollout layer as a streamed vector–matrix product.

    ``(r · Ā)_j = meanₕ Σ_q r_q · softmax_row(q)ⱼ`` computed from (q, k)
    in query blocks of ``block`` rows — the [T, T] attention matrix is never
    materialized, so rollout works on 10⁵-tile slides.
    r: [T]; q, k: [H, T, D] → new r [T].
    """
    h, t, d = q.shape
    scale = d**-0.5
    pad = (-t) % block
    q_p = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    r_p = jnp.pad(r, (0, pad))  # padded queries carry zero weight
    n_blocks = q_p.shape[1] // block

    q_blocks = q_p.reshape(h, n_blocks, block, d).transpose(1, 0, 2, 3)
    r_blocks = r_p.reshape(n_blocks, block)

    def body(acc, inputs):
        qb, rb = inputs  # [H, block, D], [block]
        s = jnp.einsum(
            "hqd,hkd->hqk", qb * scale, k, preferred_element_type=jnp.float32
        )  # [H, block, T]
        p = jnp.exp(s - jax.nn.logsumexp(s, axis=-1, keepdims=True))
        return acc + jnp.einsum("q,hqk->k", rb, p) / h, None

    acc, _ = jax.lax.scan(body, jnp.zeros((t,), jnp.float32), (q_blocks, r_blocks))
    return acc


def _attention_rollout_single(
    model, variables, feats: np.ndarray, coords: np.ndarray
) -> np.ndarray:
    """Attention rollout: CLS→tile relevance aggregated across layers
    (reference heatmaps/__init__.py:59-112).

    Small bags use the model's sown attention maps; large bags (≥
    STREAMING_ROLLOUT_MIN_SEQ tiles) stream the CLS-row product from the
    sown per-layer (q, k) instead, keeping memory O(T·D)."""
    module = model.module
    n_tiles = feats.shape[0]
    streaming = n_tiles >= STREAMING_ROLLOUT_MIN_SEQ

    kwargs: dict = dict(train=False, sow_weights=not streaming)
    if model.uses_coords:
        kwargs.update(coords=jnp.asarray(coords)[None], key_mask=None)
    _out, state = module.apply(
        variables, jnp.asarray(feats)[None], **kwargs, mutable=["intermediates"]
    )

    inter = state["intermediates"]
    block_names = sorted(k for k in inter.keys() if k.startswith("block_"))

    if streaming:
        r = None
        for block_name in block_names:
            mhsa = inter[block_name].get("mhsa", {})
            if "attn_q" not in mhsa:
                raise RuntimeError("no attention q/k collected for rollout")
            q = jnp.asarray(mhsa["attn_q"][0])[0]  # [H, T+1, D]
            k = jnp.asarray(mhsa["attn_k"][0])[0]
            if r is None:
                r = jnp.zeros((q.shape[1],), jnp.float32).at[0].set(1.0)
            r = _rollout_row_step(r, q, k)
        cls_attn = np.asarray(r)[1:]
    else:
        rollout: np.ndarray | None = None
        maps = []
        for block_name in block_names:
            mhsa = inter[block_name].get("mhsa", {})
            w = mhsa.get("attn_weights")
            if w:
                maps.append(np.asarray(w[0])[0])  # [heads, seq, seq]
        if not maps:
            raise RuntimeError("no attention maps collected from transformer layers")

        for attn in maps:
            attn = attn.mean(0)  # [seq, seq]
            attn = attn / (attn.sum(axis=-1, keepdims=True) + 1e-8)
            rollout = attn if rollout is None else rollout @ attn

        cls_attn = rollout[0, 1:]  # CLS → tiles

    cls_attn = cls_attn - cls_attn.min()
    return cls_attn / max(cls_attn.max(), 1e-8)


def _per_tile_scores(
    model, variables, feats: np.ndarray, coords: np.ndarray,
    target: str | None = None,
) -> np.ndarray:
    """Per-tile class scores via bag-of-one forwards, vmapped
    (reference heatmaps/__init__.py:417-430)."""
    module = model.module
    uses_coords = model.uses_coords

    def single(f, c):
        kwargs: dict = dict(train=False)
        if uses_coords:
            kwargs.update(coords=c[None, None], key_mask=None)
        return _debatch(module.apply(variables, f[None, None], **kwargs), target)

    logits = jax.vmap(single)(jnp.asarray(feats), jnp.asarray(coords))
    return np.asarray(jax.nn.softmax(logits, axis=1))


# raw PNG resolution: 8 px per 256 µm tile (matches the thumbnail scale)
_PX_PER_TILE = 8


def _vals_to_im(scores: np.ndarray, coords_norm: np.ndarray) -> np.ndarray:
    """Scatter per-tile values onto the [gy, gx, ...] tile grid; cells
    without a tile stay zero."""
    values = scores[:, None] if scores.ndim == 1 else scores
    gx, gy = coords_norm.max(0) + 1
    grid = np.zeros((gy, gx, *values.shape[1:]), dtype=values.dtype)
    grid[coords_norm[:, 1], coords_norm[:, 0]] = values
    return grid


def _slide_thumbnail(
    slide, grid_shape: tuple[int, int], default_slide_mpp
) -> np.ndarray:
    """RGB thumbnail at the raw-PNG scale, cropped to the tile grid."""
    mpp = get_slide_mpp_(slide, default_mpp=default_slide_mpp)
    extent_um = np.asarray(slide.dimensions, np.float64) * mpp
    request = tuple(np.round(extent_um * _PX_PER_TILE / 256).astype(int).tolist())
    thumb = np.asarray(slide.get_thumbnail(request))
    gy, gx = grid_shape
    return thumb[: gy * _PX_PER_TILE, : gx * _PX_PER_TILE]


def _save_grid_png(path: Path, rgba: np.ndarray) -> None:
    """Save an RGBA [gy, gx, 4] float grid as an upscaled nearest PNG."""
    gy, gx = rgba.shape[:2]
    Image.fromarray(np.uint8(rgba * 255)).resize(
        (gx * _PX_PER_TILE, gy * _PX_PER_TILE),
        resample=Image.Resampling.NEAREST,
    ).save(path)


def _export_ranked_tiles(
    *,
    slide,
    tiles_dir: Path,
    stem: str,
    label: str,
    tile_scores: np.ndarray,
    coords_tile_slide_px: np.ndarray,
    tile_size_slide_px: TilePixels,
    topk: int,
    bottomk: int,
) -> None:
    """Crop the best/worst-scoring tiles out of the WSI as
    ``{top|bottom}_{rank}-{stem}-{label}={score}.jpg`` (the reviewer-facing
    evidence artifact; behavior of reference heatmaps/__init__.py:190-239).
    """
    scores = np.ravel(np.asarray(tile_scores))
    ascending = np.argsort(scores)
    rankings = (("top", ascending[::-1][:topk]), ("bottom", ascending[:bottomk]))
    for prefix, ranked in rankings:
        for rank, tile in enumerate(ranked, start=1):
            x, y = (int(v) for v in coords_tile_slide_px[tile])
            crop = slide.read_region(
                (x, y), 0, (tile_size_slide_px, tile_size_slide_px)
            )
            crop.convert("RGB").save(
                tiles_dir
                / f"{prefix}_{rank:02d}-{stem}-{label}={scores[tile]:0.2f}.jpg"
            )


def _class_map_rgba(
    top_idx_grid: np.ndarray,
    occupied: np.ndarray,
    categories: Collection[str],
) -> tuple[np.ndarray, list[Patch]]:
    """Pastel map of the per-cell argmax category + matching legend."""
    cmap = plt.get_cmap("Pastel1")
    rgba = cast(np.ndarray, cmap(top_idx_grid))
    rgba[..., -1] = occupied.astype(float)
    legend = [Patch(facecolor=cmap(i), label=c) for i, c in enumerate(categories)]
    return rgba, legend


def _blend_overlay(
    thumb: np.ndarray, score_rgba: np.ndarray, alpha: float
) -> np.ndarray:
    """Alpha-blend the heat colors over the thumbnail wherever a tile
    exists (the heat alpha channel marks coverage)."""
    base = thumb.astype(np.float64) / 255.0
    heat = (
        np.asarray(
            Image.fromarray(np.uint8(score_rgba * 255)).resize(
                (thumb.shape[1], thumb.shape[0]),
                resample=Image.Resampling.NEAREST,
            ),
            dtype=np.float64,
        )
        / 255.0
    )
    blended = base.copy()
    covered = heat[..., -1] > 0
    blended[covered] = alpha * heat[covered, :3] + (1 - alpha) * base[covered]
    return (blended * 255).astype(np.uint8)


def _save_overlay_figure(
    path: Path,
    overlay: np.ndarray,
    title: str,
    *,
    with_legend: bool,
    dpi: int,
) -> None:
    fig, ax = plt.subplots(figsize=(10, 8))
    ax.imshow(overlay)
    ax.set_title(title, fontsize=16, pad=20)
    ax.axis("off")
    if with_legend:
        handles = [
            Patch(facecolor="red", alpha=0.7, label="Positive"),
            Patch(facecolor="blue", alpha=0.7, label="Negative"),
        ]
        ax.legend(handles=handles, loc="upper right", bbox_to_anchor=(0.98, 0.98))
    fig.tight_layout()
    fig.savefig(path, dpi=dpi, bbox_inches="tight")
    plt.close(fig)


def heatmaps_(
    *,
    feature_dir: Path,
    wsi_dir: Path,
    checkpoint_path: Path,
    output_dir: Path,
    slide_paths: Iterable[Path] | None,
    device: str = "auto",
    default_slide_mpp: SlideMPP | None,
    opacity: float,
    topk: int,
    bottomk: int,
) -> None:
    from stamp_tpu.modeling.train import _accelerator_device

    dev = _accelerator_device(device)
    if dev is not None:
        with jax.default_device(dev):
            return _heatmaps_impl(
                feature_dir=feature_dir,
                wsi_dir=wsi_dir,
                checkpoint_path=checkpoint_path,
                output_dir=output_dir,
                slide_paths=slide_paths,
                default_slide_mpp=default_slide_mpp,
                opacity=opacity,
                topk=topk,
                bottomk=bottomk,
            )
    return _heatmaps_impl(
        feature_dir=feature_dir,
        wsi_dir=wsi_dir,
        checkpoint_path=checkpoint_path,
        output_dir=output_dir,
        slide_paths=slide_paths,
        default_slide_mpp=default_slide_mpp,
        opacity=opacity,
        topk=topk,
        bottomk=bottomk,
    )


@dataclass(frozen=True)
class _SlideJob:
    """Everything one slide's heatmap emission needs, assembled up front."""

    stem: str
    slide: object
    feats: np.ndarray
    coords_um: np.ndarray
    grid_xy: np.ndarray  # integer tile-grid coordinates
    coords_px: np.ndarray  # level-0 pixel coordinates
    tile_px: TilePixels
    plots: Path
    raw: Path
    tiles: Path
    default_slide_mpp: SlideMPP | None

    def grid(self, per_tile: np.ndarray) -> np.ndarray:
        return _vals_to_im(per_tile, self.grid_xy)


def _load_slide_job(
    wsi_path: Path,
    h5_path: Path,
    output_dir: Path,
    default_slide_mpp: SlideMPP | None,
) -> _SlideJob:
    slide = open_slide(wsi_path)
    slide_mpp = get_slide_mpp_(slide, default_mpp=default_slide_mpp)
    assert slide_mpp is not None, "could not determine slide MPP"

    with h5py.File(h5_path) as h5:
        feat_type = h5.attrs.get("feat_type", None)
        if feat_type is not None and feat_type != "tile":
            raise ValueError(
                f"Feature file {h5_path} is a slide or patient level feature. "
                "Heatmaps are currently supported for tile-level features only."
            )
        feats = np.asarray(h5["feats"]).astype(np.float32)
        coords_info = get_coords(h5)

    coords_um = coords_info.coords_um.astype(np.float32)
    stride_um = Microns(get_stride(coords_um))
    dirs = {
        kind: output_dir / h5_path.stem / kind
        for kind in ("plots", "raw", "tiles")
    }
    for path in dirs.values():
        path.mkdir(exist_ok=True, parents=True)

    return _SlideJob(
        stem=h5_path.stem,
        slide=slide,
        feats=feats,
        coords_um=coords_um,
        grid_xy=np.round(coords_um / stride_um).astype(np.int64),
        coords_px=np.round(coords_um / slide_mpp).astype(np.int64),
        tile_px=TilePixels(
            int(round(float(coords_info.tile_size_um) / slide_mpp))
        ),
        plots=dirs["plots"],
        raw=dirs["raw"],
        tiles=dirs["tiles"],
        default_slide_mpp=default_slide_mpp,
    )


def _emit_classification(
    job: _SlideJob,
    model,
    variables,
    logits: np.ndarray,
    *,
    opacity: float,
    topk: int,
    bottomk: int,
    categories: list[str] | None = None,
    target: str | None = None,
) -> None:
    """Classification heatmaps: per-category diverging maps whose sign is
    the category's *support* (winner margin vs runner-up) and whose
    intensity is Grad-CAM attention; plus class map, overlays, overview,
    and ranked tiles for the predicted category.  ``target`` selects one
    head of a multi-target (barspoon) model; ``categories`` then carries
    that target's category list."""
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits)))
    categories = (
        list(categories) if categories is not None else list(model.categories)
    )
    predicted = int(probs.argmax())

    gradcam = _gradcam_per_category(
        model, variables, job.feats, job.coords_um, target
    )  # [tile, category]
    scores = _per_tile_scores(model, variables, job.feats, job.coords_um, target)
    occupied = job.grid(np.ones(len(job.feats))).squeeze(-1) > 0

    thumb = _slide_thumbnail(job.slide, occupied.shape, job.default_slide_mpp)
    Image.fromarray(thumb).save(job.raw / f"thumbnail-{job.stem}.png")

    class_rgba, legend = _class_map_rgba(
        job.grid(scores).argmax(-1), occupied, categories
    )
    _save_grid_png(job.raw / f"{job.stem}-classmap.png", class_rgba)

    # winner index + top-2 probabilities per tile drive the support term
    order = np.argsort(-scores, axis=-1)
    winner = order[:, 0]
    first, second = np.take_along_axis(scores, order[:, :2], axis=-1).T

    panels: list[tuple[str, np.ndarray]] = []
    for pos, category in enumerate(categories):
        # winner tiles: margin over the runner-up; others: deficit vs winner
        support = np.where(
            winner == pos, scores[:, pos] - second, scores[:, pos] - first
        )
        rival_cam = np.delete(gradcam, pos, axis=1).max(-1)
        attention = np.where(
            winner == pos,
            gradcam[:, pos] / gradcam.max(),
            rival_cam / max(rival_cam.max(), 1e-12),
        )
        heat = support * attention / max(attention.max(), 1e-12)

        rgba = cast(
            np.ndarray,
            plt.get_cmap("RdBu_r")(job.grid(heat / 2 + 0.5).squeeze(-1)),
        )
        rgba[..., -1] = job.grid(attention).squeeze(-1) > 0
        panels.append((category, rgba))

        _save_grid_png(
            job.raw / f"{job.stem}-{category}={probs[pos]:0.2f}.png", rgba
        )
        overlay = _blend_overlay(thumb, rgba, opacity)
        Image.fromarray(overlay).save(
            job.raw / f"raw-overlay-{job.stem}-{category}.png"
        )
        _save_overlay_figure(
            job.plots / f"overlay-{job.stem}-{category}.png",
            overlay,
            f"{category} - Slide Score: {probs[pos]:.3f}",
            with_legend=True,
            dpi=150,
        )
        if pos == predicted:
            _export_ranked_tiles(
                slide=job.slide,
                tiles_dir=job.tiles,
                stem=job.stem,
                label=category,
                tile_scores=heat,
                coords_tile_slide_px=job.coords_px,
                tile_size_slide_px=job.tile_px,
                topk=topk,
                bottomk=bottomk,
            )

    # overview sheet: thumbnail + class map on top, one panel per category
    fig, axs = plt.subplots(nrows=2, ncols=max(2, len(categories)), figsize=(12, 8))
    axs[0, 0].imshow(thumb)
    axs[0, 1].imshow(class_rgba)
    axs[0, 1].legend(handles=legend)
    for ax, (category, rgba), p in zip(axs[1, :], panels, probs):
        ax.imshow(rgba)
        ax.set_title(f"{category} {p:1.2f}")
    for ax in axs.ravel():
        ax.axis("off")
    fig.savefig(job.plots / f"overview-{job.stem}.png")
    plt.close(fig)


def _emit_scalar(
    job: _SlideJob,
    model,
    variables,
    logits: np.ndarray,
    *,
    task: str,
    opacity: float,
    topk: int,
    bottomk: int,
) -> None:
    """Regression/survival heatmaps: single Grad-CAM relevance map.

    Survival models with a stored ``train_pred_median`` get a diverging map
    centered on that cut-off (the same threshold statistics uses for KM
    splits); otherwise a sequential colormap."""
    value = float(np.asarray(logits).squeeze())

    gradcam = _gradcam_single(model, variables, job.feats, job.coords_um)
    relevance = gradcam / max(gradcam.max(), 1e-8)
    raw_grid = job.grid(gradcam).squeeze(-1)
    normed = (raw_grid - raw_grid.min()) / (
        raw_grid.max() - raw_grid.min() + 1e-8
    )

    cutoff = model.hparams.get("train_pred_median", None)
    if task == "survival" and cutoff is not None:
        centered = normed - cutoff
        rgba = plt.get_cmap("RdBu_r")(
            centered / (2 * np.abs(centered).max() + 1e-8) + 0.5
        )
    else:
        rgba = plt.get_cmap("Reds" if task == "survival" else "magma")(normed)
    rgba[..., -1] = (raw_grid > 0).astype(np.float32)

    _save_grid_png(job.raw / f"{job.stem}-heatmap.png", rgba)

    thumb = _slide_thumbnail(job.slide, raw_grid.shape, job.default_slide_mpp)
    Image.fromarray(thumb).save(job.raw / f"thumbnail-{job.stem}.png")

    overlay = _blend_overlay(thumb, rgba, opacity)
    Image.fromarray(overlay).save(job.raw / f"raw-overlay-{job.stem}.png")
    _save_overlay_figure(
        job.plots / f"overlay-{job.stem}.png",
        overlay,
        f"{task} - Slide Score: {value:.3f}",
        with_legend=False,
        dpi=300,
    )

    fig, axs = plt.subplots(1, 2, figsize=(12, 6), facecolor="white")
    for ax, image, title in zip(
        axs, (thumb, overlay), ("Thumbnail", f"Prediction Heatmap ({value:.3f})")
    ):
        ax.imshow(image)
        ax.set_title(title)
        ax.axis("off")
    fig.savefig(job.plots / f"overview-{job.stem}.png", dpi=300, bbox_inches="tight")
    plt.close(fig)

    _export_ranked_tiles(
        slide=job.slide,
        tiles_dir=job.tiles,
        stem=job.stem,
        label=task,
        tile_scores=relevance,
        coords_tile_slide_px=job.coords_px,
        tile_size_slide_px=job.tile_px,
        topk=topk,
        bottomk=bottomk,
    )


def _heatmaps_impl(
    *,
    feature_dir: Path,
    wsi_dir: Path,
    checkpoint_path: Path,
    output_dir: Path,
    slide_paths: Iterable[Path] | None,
    default_slide_mpp: SlideMPP | None,
    opacity: float,
    topk: int,
    bottomk: int,
) -> None:
    model, variables = load_model_from_ckpt(checkpoint_path)
    stamp_version = str(model.hparams.get("stamp_version", ""))
    if Version(stamp_version) < Version("2.5.0"):
        raise ValueError(
            f"model has been built with stamp version {stamp_version} "
            "which is incompatible with the current version."
        )
    fwd = _forward_fn(model, variables)

    if slide_paths is not None:
        worklist = (wsi_dir / slide for slide in slide_paths)
    else:
        worklist = (
            p for ext in supported_extensions for p in wsi_dir.glob(f"**/*{ext}")
        )

    for wsi_path in worklist:
        h5_path = feature_dir / wsi_path.with_suffix(".h5").name
        if not h5_path.exists():
            _logger.info(f"could not find matching h5 file at {h5_path}. Skipping...")
            continue

        _logger.info(f"creating heatmaps for {wsi_path.name}")
        job = _load_slide_job(wsi_path, h5_path, output_dir, default_slide_mpp)
        out = fwd(jnp.asarray(job.feats), jnp.asarray(job.coords_um))

        task = model.hparams["task"]
        if task == "classification" and isinstance(out, dict):
            # multi-target (barspoon): one full heatmap set per target,
            # filenames suffixed with the sanitized target label.  The
            # reference has no counterpart — its gradcam passes coords=
            # into model.forward and expects a tensor back
            # (heatmaps/__init__.py:36-56), which the EncDec dict breaks.
            from stamp_tpu.models.barspoon import sanitize

            for t_label, cats in model.categories.items():
                tjob = dc_replace(
                    job, stem=f"{job.stem}-{sanitize(t_label)}"
                )
                _emit_classification(
                    tjob, model, variables, np.asarray(out[t_label]),
                    opacity=opacity, topk=topk, bottomk=bottomk,
                    categories=list(cats), target=t_label,
                )
        elif task == "classification":
            logits = np.asarray(out)
            _emit_classification(
                job, model, variables, logits,
                opacity=opacity, topk=topk, bottomk=bottomk,
            )
        elif task in ("regression", "survival"):
            _emit_scalar(
                job, model, variables, np.asarray(out),
                task=task, opacity=opacity, topk=topk, bottomk=bottomk,
            )
        else:
            raise ValueError(f"unsupported task for heatmaps: {task}")
