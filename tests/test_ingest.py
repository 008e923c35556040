"""Ingestion (download + image scrape w/ backoff) and the wired
feature-extraction path of the preprocessing pipeline
(reference notebook cells 4, 12, 15, 18)."""
import gzip
import io
import json
import os

import numpy as np
import pytest
import torch

from pmgt_tpu.data.ingest import (
    download_reviews,
    load_image_urls,
    scrape_images,
)


class _Resp(io.BytesIO):
    """urllib-response stand-in (context manager + read)."""


def test_download_reviews_writes_dump(tmp_path):
    payload = gzip.compress(b'{"reviewerID": "u", "asin": "A"}\n')
    urls = []

    def opener(url, **kw):
        urls.append(url)
        return _Resp(payload)

    out = download_reviews("VG", str(tmp_path), opener=opener)
    assert out.endswith("reviews.json.gz")
    assert open(out, "rb").read() == payload
    assert urls == [
        "http://deepyeti.ucsd.edu/jianmo/amazon/categoryFilesSmall/"
        "Video_Games_5.json.gz"
    ]
    # idempotent: second call skips the download
    download_reviews("VG", str(tmp_path), opener=opener)
    assert len(urls) == 1


def test_load_image_urls_field_variants(tmp_path):
    meta = tmp_path / "meta.json"
    meta.write_text(
        "\n".join(
            [
                json.dumps({"asin": "A", "imUrl": "http://x/a.jpg"}),
                json.dumps({"asin": "B", "imageURLHighRes": ["http://x/b1.png", "http://x/b2.png"]}),
                json.dumps({"asin": "C"}),  # no image
                "not json",
            ]
        )
    )
    urls = load_image_urls(str(meta))
    assert urls == {
        "A": ["http://x/a.jpg"],
        "B": ["http://x/b1.png", "http://x/b2.png"],
    }


def test_scrape_images_retries_with_backoff(tmp_path):
    """First two fetches of each URL fail; backoff waits are exponential
    and every image still lands (the reference's cell-12 retry loop)."""
    attempts = {}
    waits = []

    def opener(url, **kw):
        n = attempts.get(url, 0) + 1
        attempts[url] = n
        if n <= 2:
            raise OSError("transient")
        return _Resp(b"IMGDATA" + url.encode())

    done, failed = scrape_images(
        {"A": ["http://x/a.jpg"], "B": ["http://x/b.png"]},
        str(tmp_path / "images"),
        max_workers=1,
        max_retries=4,
        backoff=0.5,
        opener=opener,
        sleep=waits.append,
    )
    assert (done, failed) == (2, 0)
    assert sorted(waits) == [0.5, 0.5, 1.0, 1.0]  # 2 urls x backoff*2^k
    assert (tmp_path / "images" / "A" / "0.jpg").read_bytes().startswith(b"IMGDATA")
    assert (tmp_path / "images" / "B" / "0.png").exists()


def test_scrape_images_gives_up_after_retries(tmp_path):
    def opener(url, **kw):
        raise OSError("down")

    done, failed = scrape_images(
        {"A": ["http://x/a.jpg"]},
        str(tmp_path / "images"),
        max_retries=2,
        backoff=0.1,
        opener=opener,
        sleep=lambda s: None,
    )
    assert (done, failed) == (0, 1)


# ----------------------------------------------------------------------
# end-to-end: preprocess --extract-features on a toy raw dir
# ----------------------------------------------------------------------

class StubCNN(torch.nn.Module):
    """Tiny deterministic stand-in exposing the timm surface the
    extractor uses (forward_features + global_pool)."""

    def __init__(self, dim=8):
        super().__init__()
        torch.manual_seed(0)
        self.conv = torch.nn.Conv2d(3, dim, kernel_size=5, stride=7)

    def forward_features(self, x):
        return self.conv(x)

    def global_pool(self, x):
        return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    """A real (randomly initialized) 1-layer BERT + WordPiece tokenizer
    saved locally, so the actual HF extraction path runs hermetically."""
    from transformers import BertConfig, BertModel, BertTokenizer

    d = tmp_path_factory.mktemp("tiny_bert")
    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=32,
        hidden_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=32,
        max_position_embeddings=64,
    )
    BertModel(cfg).save_pretrained(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "great", "game", "bad", "toy", "fun", "the", "a"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizer(str(d / "vocab.txt")).save_pretrained(d)
    return str(d)


def _toy_raw_dir(tmp_path):
    from PIL import Image

    raw = tmp_path / "raw"
    raw.mkdir()
    pre_t, post_t = 1_000_000, 2_000_000_000  # around the 2015 cutoff
    reviews = []
    # 3 users co-review A/B/C before the split -> triangle graph
    for u in ("u1", "u2", "u3"):
        for a in ("A", "B", "C"):
            text = "great fun game" if a in ("A", "B") else "bad toy"
            reviews.append(
                {"reviewerID": u, "asin": a, "unixReviewTime": pre_t,
                 "reviewText": text}
            )
    # post-split interactions
    for u in ("u4", "u5"):
        for a in ("A", "B", "C"):
            reviews.append(
                {"reviewerID": u, "asin": a, "unixReviewTime": post_t}
            )
    (raw / "reviews.json").write_text(
        "\n".join(json.dumps(r) for r in reviews)
    )
    img_dir = raw / "images"
    for asin, color in (("A", (255, 0, 0)), ("B", (0, 0, 255))):
        (img_dir / asin).mkdir(parents=True)
        Image.new("RGB", (32, 32), color).save(img_dir / asin / "0.png")
    return raw


def test_preprocess_extract_features_end_to_end(tmp_path, tiny_bert_dir):
    from pmgt_tpu.data.feature_extraction import (
        default_image_transform,
        extract_visual_features,
        iter_item_images,
    )
    from pmgt_tpu.data.preprocess import run_preprocess

    raw = _toy_raw_dir(tmp_path)
    art = run_preprocess(
        raw_dir=str(raw),
        out_dir=str(tmp_path / "out"),
        dataset_name="toy",
        min_common_users=3,
        split_date="2015-01-01",
        seed=0,
        extract_features=True,
        text_model=tiny_bert_dir,
        visual_model=StubCNN(),
        visual_transform=default_image_transform(32),
    )
    nodes = list(art.node_classes)
    assert sorted(nodes) == ["A", "B", "C"]
    visual, textual = art.feat_init_embs

    # Textual: extraction is real, so items with identical review text get
    # identical rows (random fallback rows would differ).
    rows = {a: textual[2 + nodes.index(a)] for a in "ABC"}
    np.testing.assert_allclose(rows["A"], rows["B"], atol=1e-6)
    assert not np.allclose(rows["A"], rows["C"])
    assert textual.shape[1] == 16  # tiny BERT hidden, not the 768 fallback

    # Visual: rows must equal a direct extractor run; C (no images) gets a
    # random fallback row.
    feats, mapping = extract_visual_features(
        iter_item_images(str(raw / "images")),
        model=StubCNN(),
        transform=default_image_transform(32),
    )
    for asin, feat in zip(mapping, feats):
        np.testing.assert_allclose(
            visual[2 + nodes.index(asin)], feat, atol=1e-6
        )
    assert visual.shape[1] == 8

    # The notebook-format intermediate npz files are emitted.
    assert os.path.exists(tmp_path / "out" / "toy_textual_feats.npz")
    assert os.path.exists(tmp_path / "out" / "toy_visual_feats.npz")

    # Special rows stay zero.
    assert not textual[:2].any() and not visual[:2].any()


def test_preprocess_extraction_fallback_is_graceful(tmp_path, tiny_bert_dir):
    """With an unavailable visual model (no timm here), the textual table
    is still extracted and the visual table falls back to random."""
    from pmgt_tpu.data.preprocess import run_preprocess

    raw = _toy_raw_dir(tmp_path)
    art = run_preprocess(
        raw_dir=str(raw),
        out_dir=str(tmp_path / "out"),
        dataset_name="toy",
        min_common_users=3,
        split_date="2015-01-01",
        seed=0,
        extract_features=True,
        text_model=tiny_bert_dir,
        visual_dim=24,
        # visual_model=None and timm absent -> graceful fallback
    )
    visual, textual = art.feat_init_embs
    assert textual.shape[1] == 16  # extracted
    assert visual.shape[1] == 24  # random fallback at the requested dim


def test_preprocess_consumes_preseeded_feature_npz(tmp_path):
    """Pre-extracted feature npz drop-ins (the files the extractors
    write) must be consumed as-is, skipping the model calls entirely —
    the data-only reproduction path for a sandbox with neither egress
    nor feature weights (tools/reproduce_published.py)."""
    from pmgt_tpu.data.preprocess import run_preprocess

    raw = _toy_raw_dir(tmp_path)
    out = tmp_path / "out"
    out.mkdir()
    vis = np.arange(3 * 6, dtype=np.float32).reshape(3, 6)
    txt = np.arange(3 * 4, dtype=np.float32).reshape(3, 4) + 100.0
    for kind, feats in (("visual", vis), ("textual", txt)):
        np.savez_compressed(
            out / f"toy_{kind}_feats.npz",
            feats=feats,
            asins=np.asarray(["A", "B", "C"], dtype=object),
        )
    art = run_preprocess(
        raw_dir=str(raw),
        out_dir=str(out),
        dataset_name="toy",
        min_common_users=3,
        split_date="2015-01-01",
        seed=0,
        extract_features=True,
        # no text/visual models supplied: only the npz can provide rows
    )
    visual, textual = art.feat_init_embs
    nodes = list(art.node_classes)
    for i, asin in enumerate("ABC"):
        row = 2 + nodes.index(asin)
        np.testing.assert_allclose(visual[row], vis[i])
        np.testing.assert_allclose(textual[row], txt[i])
    assert visual.shape[1] == 6 and textual.shape[1] == 4
