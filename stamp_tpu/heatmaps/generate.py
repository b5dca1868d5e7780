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
from functools import partial
from pathlib import Path
from typing import cast

import h5py
import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.axes import Axes
from matplotlib.figure import Figure
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


def _forward_fn(model, variables):
    module = model.module
    uses_coords = model.uses_coords

    def fwd(feats, coords):
        kwargs: dict = dict(train=False)
        if uses_coords:
            kwargs.update(coords=coords[None], key_mask=None)
        return module.apply(variables, feats[None], **kwargs)[0]

    return fwd


def _gradcam_per_category(
    model, variables, feats: np.ndarray, coords: np.ndarray
) -> np.ndarray:
    """[tile, category] Grad-CAM scores (reference heatmaps/__init__.py:36-56)."""
    fwd = _forward_fn(model, variables)
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
    model, variables, feats: np.ndarray, coords: np.ndarray
) -> np.ndarray:
    """Per-tile class scores via bag-of-one forwards, vmapped
    (reference heatmaps/__init__.py:417-430)."""
    module = model.module
    uses_coords = model.uses_coords

    def single(f, c):
        kwargs: dict = dict(train=False)
        if uses_coords:
            kwargs.update(coords=c[None, None], key_mask=None)
        return module.apply(variables, f[None, None], **kwargs)[0]

    logits = jax.vmap(single)(jnp.asarray(feats), jnp.asarray(coords))
    return np.asarray(jax.nn.softmax(logits, axis=1))


def _vals_to_im(scores: np.ndarray, coords_norm: np.ndarray) -> np.ndarray:
    """Arranges scores in a 2d grid according to coordinates
    (reference heatmaps/__init__.py:142-156)."""
    size = coords_norm.max(0)[::-1] + 1
    if scores.ndim == 1:
        scores = scores[:, None]
    im = np.zeros((*size.tolist(), *scores.shape[1:]), dtype=scores.dtype)
    flattened_im = im.reshape(-1, *scores.shape[1:])
    flattened_coords = coords_norm[:, 1] * im.shape[1] + coords_norm[:, 0]
    flattened_im[flattened_coords] = scores
    return flattened_im.reshape(im.shape)


def _show_thumb(slide, thumb_ax: Axes, attention: np.ndarray, default_slide_mpp):
    mpp = get_slide_mpp_(slide, default_mpp=default_slide_mpp)
    dims_um = np.array(slide.dimensions) * mpp
    thumb_size = tuple(np.round(dims_um * 8 / 256).astype(int).tolist())
    thumb = slide.get_thumbnail(thumb_size)
    arr = np.array(thumb)[: attention.shape[0] * 8, : attention.shape[1] * 8]
    thumb_ax.imshow(arr)
    return arr


def _get_thumb_array(slide, attention: np.ndarray, default_slide_mpp) -> np.ndarray:
    mpp = get_slide_mpp_(slide, default_mpp=default_slide_mpp)
    dims_um = np.array(slide.dimensions) * mpp
    thumb_size = tuple(np.round(dims_um * 8 / 256).astype(int).tolist())
    thumb = np.array(slide.get_thumbnail(thumb_size))
    return thumb[: attention.shape[0] * 8, : attention.shape[1] * 8]


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
    """Save the highest- and lowest-scoring tiles (heatmaps/__init__.py:190-239)."""
    scores = np.asarray(tile_scores).flatten()
    if scores.size == 0:
        return

    def _save_tile(*, prefix: str, rank: int, tile_index: int, score: float) -> None:
        slide.read_region(
            tuple(coords_tile_slide_px[tile_index].tolist()),
            0,
            (tile_size_slide_px, tile_size_slide_px),
        ).convert("RGB").save(
            tiles_dir / f"{prefix}_{rank:02d}-{stem}-{label}={score:0.2f}.jpg"
        )

    top_count = min(topk, scores.size)
    if top_count > 0:
        top_indices = np.argsort(-scores)[:top_count]
        for rank, index in enumerate(top_indices, start=1):
            _save_tile(
                prefix="top",
                rank=rank,
                tile_index=int(index),
                score=float(scores[index]),
            )

    bottom_count = min(bottomk, scores.size)
    if bottom_count > 0:
        bottom_indices = np.argsort(scores)[:bottom_count]
        for rank, index in enumerate(bottom_indices, start=1):
            _save_tile(
                prefix="bottom",
                rank=rank,
                tile_index=int(index),
                score=float(scores[index]),
            )


def _show_class_map(
    class_ax: Axes,
    top_score_indices: np.ndarray,
    gradcam_2d: np.ndarray,
    categories: Collection[str],
) -> tuple[np.ndarray, list[Patch]]:
    cmap = plt.get_cmap("Pastel1")
    classes = cast(np.ndarray, cmap(top_score_indices))
    classes[..., -1] = (gradcam_2d.sum(-1) > 0) * 1.0
    class_ax.imshow(classes)
    legend_patches = [
        Patch(facecolor=cmap(i), label=cat) for i, cat in enumerate(categories)
    ]
    class_ax.legend(handles=legend_patches)
    return classes, legend_patches


def _create_overlay(
    thumb: np.ndarray, score_im: np.ndarray, alpha: float
) -> np.ndarray:
    thumb_height, thumb_width = thumb.shape[:2]
    score_resized = Image.fromarray(np.uint8(score_im * 255)).resize(
        (thumb_width, thumb_height), resample=Image.Resampling.NEAREST
    )
    score_resized = np.array(score_resized) / 255.0

    thumb_float = thumb.astype(float) / 255.0
    mask = score_resized[..., -1] > 0
    overlay = thumb_float.copy()
    overlay[mask] = alpha * score_resized[mask, :3] + (1 - alpha) * thumb_float[mask]
    return (overlay * 255).astype(np.uint8)


def _create_plotted_overlay(
    thumb: np.ndarray,
    score_im: np.ndarray,
    category: str,
    slide_score: float,
    alpha: float,
) -> tuple[Figure, Axes]:
    overlay = _create_overlay(thumb, score_im, alpha)
    fig, ax = plt.subplots(figsize=(10, 8))
    ax.imshow(overlay)
    ax.set_title(f"{category} - Slide Score: {slide_score:.3f}", fontsize=16, pad=20)
    ax.axis("off")
    if category not in {"regression", "survival"}:
        legend_elements = [
            Patch(facecolor="red", alpha=0.7, label="Positive"),
            Patch(facecolor="blue", alpha=0.7, label="Negative"),
        ]
        ax.legend(
            handles=legend_elements, loc="upper right", bbox_to_anchor=(0.98, 0.98)
        )
    plt.tight_layout()
    return fig, ax


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
    if slide_paths is not None:
        wsis_to_process = (wsi_dir / slide for slide in slide_paths)
    else:
        wsis_to_process = (
            p for ext in supported_extensions for p in wsi_dir.glob(f"**/*{ext}")
        )

    for wsi_path in wsis_to_process:
        h5_path = feature_dir / wsi_path.with_suffix(".h5").name

        if not h5_path.exists():
            _logger.info(f"could not find matching h5 file at {h5_path}. Skipping...")
            continue

        slide_output_dir = output_dir / h5_path.stem
        plots_dir = slide_output_dir / "plots"
        raw_dir = slide_output_dir / "raw"
        tiles_dir = slide_output_dir / "tiles"
        for dir_path in [plots_dir, raw_dir, tiles_dir]:
            dir_path.mkdir(exist_ok=True, parents=True)

        _logger.info(f"creating heatmaps for {wsi_path.name}")

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
            tile_size_slide_px = TilePixels(
                int(round(float(coords_info.tile_size_um) / slide_mpp))
            )

        coords_norm = np.round(coords_um / stride_um).astype(np.int64)
        coords_tile_slide_px = np.round(coords_um / slide_mpp).astype(np.int64)

        model, variables = load_model_from_ckpt(checkpoint_path)

        stamp_version = str(model.hparams.get("stamp_version", ""))
        if Version(stamp_version) < Version("2.5.0"):
            raise ValueError(
                f"model has been built with stamp version {stamp_version} "
                "which is incompatible with the current version."
            )

        fwd = _forward_fn(model, variables)
        slide_score = np.asarray(fwd(jnp.asarray(feats), jnp.asarray(coords_um)))

        match model.hparams["task"]:
            case "classification":
                slide_score = np.asarray(jax.nn.softmax(jnp.asarray(slide_score)))
                highest_prob_class_idx = int(slide_score.argmax())

                gradcam = _gradcam_per_category(model, variables, feats, coords_um)
                gradcam_2d = _vals_to_im(gradcam, coords_norm)

                scores = _per_tile_scores(model, variables, feats, coords_um)
                scores_2d = _vals_to_im(scores, coords_norm)

                categories = list(model.categories)
                fig, axs = plt.subplots(
                    nrows=2, ncols=max(2, len(categories)), figsize=(12, 8)
                )

                # class map: index of top-scoring class per tile position
                top1_idx = scores_2d.argmax(-1)
                classes_img, _legend = _show_class_map(
                    class_ax=axs[0, 1],
                    top_score_indices=top1_idx,
                    gradcam_2d=gradcam_2d,
                    categories=categories,
                )
                target_size = np.array(classes_img.shape[:2][::-1]) * 8
                Image.fromarray(np.uint8(classes_img * 255)).resize(
                    tuple(target_size), resample=Image.Resampling.NEAREST
                ).save(raw_dir / f"{h5_path.stem}-classmap.png")

                thumb = _show_thumb(
                    slide=slide,
                    thumb_ax=axs[0, 0],
                    attention=_vals_to_im(
                        np.zeros((len(feats), 1)), coords_norm
                    ).squeeze(-1),
                    default_slide_mpp=default_slide_mpp,
                )

                # top-2 scores per tile for category support
                order = np.argsort(-scores, axis=-1)
                top1 = order[:, 0]
                top2_val = np.take_along_axis(scores, order, axis=-1)[:, 1]
                top1_val = np.take_along_axis(scores, order, axis=-1)[:, 0]

                attention = None
                for ax, (pos_idx, category) in zip(
                    axs[1, :], enumerate(categories)
                ):
                    category_support = np.where(
                        top1 == pos_idx,
                        scores[:, pos_idx] - top2_val,
                        scores[:, pos_idx] - top1_val,
                    )
                    assert ((category_support >= -1) & (category_support <= 1)).all()

                    others_idx = list(set(range(len(categories))) - {pos_idx})
                    others = gradcam[:, others_idx].max(-1)
                    attention = np.where(
                        top1 == pos_idx,
                        gradcam[:, pos_idx] / gradcam.max(),
                        others / max(others.max(), 1e-12),
                    )

                    category_score = (
                        category_support * attention / max(attention.max(), 1e-12)
                    )

                    score_im = cast(
                        np.ndarray,
                        plt.get_cmap("RdBu_r")(
                            _vals_to_im(
                                category_score[:, None] / 2 + 0.5, coords_norm
                            ).squeeze(-1)
                        ),
                    )
                    score_im[..., -1] = (
                        _vals_to_im(attention[:, None], coords_norm).squeeze(-1) > 0
                    )

                    ax.imshow(score_im)
                    ax.set_title(f"{category} {slide_score[pos_idx]:1.2f}")
                    target_size = np.array(score_im.shape[:2][::-1]) * 8
                    Image.fromarray(np.uint8(score_im * 255)).resize(
                        tuple(target_size), resample=Image.Resampling.NEAREST
                    ).save(
                        raw_dir
                        / f"{h5_path.stem}-{category}={slide_score[pos_idx]:0.2f}.png"
                    )

                    overlay = _create_overlay(
                        thumb=thumb, score_im=score_im, alpha=opacity
                    )
                    Image.fromarray(overlay).save(
                        raw_dir / f"raw-overlay-{h5_path.stem}-{category}.png"
                    )

                    overlay_fig, _overlay_ax = _create_plotted_overlay(
                        thumb=thumb,
                        score_im=score_im,
                        category=category,
                        slide_score=float(slide_score[pos_idx]),
                        alpha=opacity,
                    )
                    overlay_fig.savefig(
                        plots_dir / f"overlay-{h5_path.stem}-{category}.png",
                        dpi=150,
                        bbox_inches="tight",
                    )
                    plt.close(overlay_fig)

                    if pos_idx == highest_prob_class_idx:
                        _export_ranked_tiles(
                            slide=slide,
                            tiles_dir=tiles_dir,
                            stem=h5_path.stem,
                            label=category,
                            tile_scores=category_score,
                            coords_tile_slide_px=coords_tile_slide_px,
                            tile_size_slide_px=tile_size_slide_px,
                            topk=topk,
                            bottomk=bottomk,
                        )

                assert attention is not None

                Image.fromarray(thumb).save(raw_dir / f"thumbnail-{h5_path.stem}.png")
                for ax in axs.ravel():
                    ax.axis("off")
                fig.savefig(plots_dir / f"overview-{h5_path.stem}.png")
                plt.close(fig)

            case "regression" | "survival" as task:
                slide_score_f = float(np.asarray(slide_score).squeeze())

                gradcam = _gradcam_single(model, variables, feats, coords_um)
                tile_relevance = gradcam / max(gradcam.max(), 1e-8)
                gradcam_2d = _vals_to_im(gradcam, coords_norm).squeeze(-1)
                gradcam_2d = (gradcam_2d - gradcam_2d.min()) / (
                    gradcam_2d.max() - gradcam_2d.min() + 1e-8
                )

                train_pred_median = model.hparams.get("train_pred_median", None)
                if task == "survival" and train_pred_median is not None:
                    centered = gradcam_2d - train_pred_median
                    score_im = plt.get_cmap("RdBu_r")(
                        centered / (2 * np.abs(centered).max() + 1e-8) + 0.5
                    )
                elif task == "survival":
                    score_im = plt.get_cmap("Reds")(gradcam_2d)
                else:
                    score_im = plt.get_cmap("magma")(gradcam_2d)

                alpha_mask = _vals_to_im(gradcam, coords_norm).squeeze(-1)
                score_im[..., -1] = (alpha_mask > 0).astype(np.float32)

                target_size = np.array(score_im.shape[:2][::-1]) * 8
                Image.fromarray(np.uint8(score_im * 255)).resize(
                    tuple(target_size), resample=Image.Resampling.NEAREST
                ).save(raw_dir / f"{h5_path.stem}-heatmap.png")

                thumb = _get_thumb_array(
                    slide=slide,
                    attention=_vals_to_im(np.zeros((len(feats), 1)), coords_norm),
                    default_slide_mpp=default_slide_mpp,
                )
                Image.fromarray(thumb).save(raw_dir / f"thumbnail-{h5_path.stem}.png")

                overlay = _create_overlay(
                    thumb=thumb, score_im=score_im, alpha=opacity
                )
                Image.fromarray(overlay).save(
                    raw_dir / f"raw-overlay-{h5_path.stem}.png"
                )

                overlay_fig, _overlay_ax = _create_plotted_overlay(
                    thumb=thumb,
                    score_im=score_im,
                    category=task,
                    slide_score=slide_score_f,
                    alpha=opacity,
                )
                overlay_fig.savefig(
                    plots_dir / f"overlay-{h5_path.stem}.png",
                    dpi=300,
                    bbox_inches="tight",
                )
                plt.close(overlay_fig)

                fig, axs = plt.subplots(1, 2, figsize=(12, 6), facecolor="white")
                axs[0].imshow(thumb)
                axs[0].set_title("Thumbnail")
                axs[1].imshow(overlay)
                axs[1].set_title(f"Prediction Heatmap ({slide_score_f:.3f})")
                for ax in axs:
                    ax.axis("off")
                fig.savefig(
                    plots_dir / f"overview-{h5_path.stem}.png",
                    dpi=300,
                    bbox_inches="tight",
                )
                plt.close(fig)

                _export_ranked_tiles(
                    slide=slide,
                    tiles_dir=tiles_dir,
                    stem=h5_path.stem,
                    label=task,
                    tile_scores=tile_relevance,
                    coords_tile_slide_px=coords_tile_slide_px,
                    tile_size_slide_px=tile_size_slide_px,
                    topk=topk,
                    bottomk=bottomk,
                )
