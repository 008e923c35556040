"""Multimodal feature extraction: Inception-v4 visual + BERT textual.

Behavioral reference: pmgt/preprocessing/datasets.py:28-84 (image/text
dataset walking + tokenization contract) and notebook cells 15 (timm
Inception-v4 ``forward_features`` + ``global_pool``, mean over an item's
images) and 18 (BERT CLS embedding, max_length 128, mean over an item's
reviews).

Runs in torch on the host (feature extraction is a one-time offline
stage; the TPU path starts at the emitted tables). Models are injectable
so tests run hermetically with tiny stand-ins; ``run_preprocess`` falls
back gracefully per modality when weights are unavailable (no network).
"""
from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("pmgt_tpu")

TEXT_MAX_LENGTH = 128  # reference preprocessing/datasets.py:80


def default_image_transform(size: int = 299) -> Callable:
    """PIL image → float tensor [3, size, size], inception-style
    normalization ((x/255 - 0.5) / 0.5), deterministic resize."""
    import torch

    def transform(img):
        img = img.convert("RGB").resize((size, size))
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        return torch.from_numpy(arr.transpose(2, 0, 1))

    return transform


def iter_item_images(
    images_dir: str,
) -> Iterator[Tuple[str, List]]:
    """Walk ``<images_dir>/<asin>/*`` (reference
    preprocessing/datasets.py:28-45) yielding (asin, [PIL images]),
    sorted for determinism. Unreadable files are skipped."""
    from PIL import Image

    if not os.path.isdir(images_dir):
        return
    for asin in sorted(os.listdir(images_dir)):
        item_dir = os.path.join(images_dir, asin)
        if not os.path.isdir(item_dir):
            continue
        images = []
        for name in sorted(os.listdir(item_dir)):
            # Skip in-flight scraper tmp files: a run killed between
            # write and rename leaves <img>.part, and a fully-written
            # one opens fine in PIL — feeding a duplicate image into
            # the item's mean-pooled feature on the rerun.
            if name.endswith(".part"):
                continue
            path = os.path.join(item_dir, name)
            try:
                with Image.open(path) as img:
                    images.append(img.convert("RGB"))
            except Exception:  # noqa: BLE001 — corrupt downloads are expected
                logger.warning("skipping unreadable image %s", path)
        if images:
            yield asin, images


def extract_visual_features(
    item_images: Iterable[Tuple[str, Sequence]],
    model=None,
    transform: Optional[Callable] = None,
    model_name: str = "inception_v4",
    device: str = "cpu",
) -> Tuple[np.ndarray, List[str]]:
    """Per-item visual features: ``forward_features`` + ``global_pool``
    per image, mean over the item's images (notebook cell 15).

    ``model`` may be any module exposing that timm surface; when None the
    timm model ``model_name`` is created with pretrained weights.

    Returns (features [K, D] float32, asins in iteration order).
    """
    import torch

    if model is None:
        import timm

        model = timm.create_model(model_name, pretrained=True)
    if transform is None:
        transform = default_image_transform()
    model = model.to(device)
    model.eval()

    feats: List[np.ndarray] = []
    mapping: List[str] = []
    with torch.no_grad():
        for asin, images in item_images:
            batch = torch.stack([transform(img) for img in images]).to(device)
            pooled = model.global_pool(model.forward_features(batch))
            if pooled.dim() > 2:
                pooled = pooled.flatten(1)
            feats.append(
                pooled.mean(dim=0).cpu().numpy().astype(np.float32)
            )
            mapping.append(asin)
    if not feats:
        return np.zeros((0, 0), np.float32), []
    return np.stack(feats), mapping


def extract_textual_features(
    item_texts: Dict[str, Sequence[str]],
    model=None,
    tokenizer=None,
    model_name: str = "bert-base-uncased",
    device: str = "cpu",
    batch_size: int = 16,
    max_length: int = TEXT_MAX_LENGTH,
) -> Tuple[np.ndarray, List[str]]:
    """Per-item textual features: BERT CLS hidden state per review, mean
    over the item's reviews (notebook cell 18; tokenization contract from
    reference preprocessing/datasets.py:73-84).

    Returns (features [K, D] float32, asins in dict order).
    """
    import torch

    if model is None or tokenizer is None:
        from transformers import AutoModel, AutoTokenizer

        tokenizer = tokenizer or AutoTokenizer.from_pretrained(model_name)
        model = model or AutoModel.from_pretrained(model_name)
    model = model.to(device)
    model.eval()

    feats: List[np.ndarray] = []
    mapping: List[str] = []
    with torch.no_grad():
        for asin, texts in item_texts.items():
            texts = [t for t in texts if t]
            if not texts:
                continue
            cls_rows = []
            for i in range(0, len(texts), batch_size):
                enc = tokenizer(
                    list(texts[i : i + batch_size]),
                    padding=True,
                    truncation=True,
                    max_length=max_length,
                    return_tensors="pt",
                ).to(device)
                out = model(**enc)
                cls_rows.append(out.last_hidden_state[:, 0].cpu().numpy())
            feats.append(
                np.concatenate(cls_rows).mean(axis=0).astype(np.float32)
            )
            mapping.append(asin)
    if not feats:
        return np.zeros((0, 0), np.float32), []
    return np.stack(feats), mapping
