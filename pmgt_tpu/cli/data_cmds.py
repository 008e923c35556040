"""Data commands: synthetic dataset generation and offline preprocessing."""
from __future__ import annotations

import logging

import click

from pmgt_tpu.cli.main import cli

logger = logging.getLogger("pmgt_tpu")


@cli.command(context_settings={"show_default": True})
@click.option("--out-dir", type=click.Path(), required=True)
@click.option("--num-nodes", type=click.INT, default=2000)
@click.option("--num-users", type=click.INT, default=5000)
@click.option("--visual-dim", type=click.INT, default=1536)
@click.option("--textual-dim", type=click.INT, default=768)
@click.option("--avg-degree", type=click.INT, default=16)
@click.option("--interactions-per-user", type=click.INT, default=12)
@click.option("--seed", type=click.INT, default=0)
@click.option("--shape", type=click.Choice(["VG", "TG"]), default=None,
              help="generate at the EXACT published scale/sparsity of the "
              "VG or TG dataset (power-law degrees and user activity); "
              "overrides the count options")
@click.option("--signal", type=click.FLOAT, default=1.0,
              help="graph→interaction signal strength for --shape datasets "
              "(data/synthetic.py make_published_shape_dataset); calibrated "
              "per-shape values live in tools/validate_pipeline.py")
def make_synthetic(
    out_dir,
    num_nodes,
    num_users,
    visual_dim,
    textual_dim,
    avg_degree,
    interactions_per_user,
    seed,
    shape,
    signal,
):
    """Generate a synthetic dataset in the native artifact format."""
    from pmgt_tpu.data.artifacts import save_native
    from pmgt_tpu.data.synthetic import (
        make_published_shape_dataset,
        make_synthetic_dataset,
    )

    if signal != 1.0 and not shape:
        raise click.UsageError("--signal applies only to --shape datasets")
    if shape:
        art = make_published_shape_dataset(
            shape, feat_dims=(visual_dim, textual_dim), seed=seed,
            signal=signal,
        )
    else:
        art = make_synthetic_dataset(
            num_nodes=num_nodes,
            num_users=num_users,
            feat_dims=(visual_dim, textual_dim),
            avg_degree=avg_degree,
            interactions_per_user=interactions_per_user,
            seed=seed,
        )
    save_native(out_dir, art)
    logger.info(
        "wrote synthetic dataset to %s (%d nodes, %d users, %d train pairs)",
        out_dir,
        art.num_nodes,
        art.num_users,
        len(art.train_pairs),
    )


@cli.command(context_settings={"show_default": True})
@click.option("--raw-dir", type=click.Path(), required=True,
              help="directory with reviews.json[.gz] and optional metadata "
              "(created by --download when absent)")
@click.option("--out-dir", type=click.Path(), required=True)
@click.option("--dataset-name", type=click.STRING, required=True)
@click.option("--min-common-users", type=click.INT, default=3)
@click.option("--split-date", type=click.STRING, default="2015-01-01")
@click.option("--test-size", type=click.FLOAT, default=0.2)
@click.option("--seed", type=click.INT, default=0)
@click.option("--extract-features/--no-extract-features", default=False,
              help="run Inception-v4/BERT feature extraction in-process "
              "(graceful per-modality fallback when weights are unavailable)")
@click.option("--text-model", type=click.STRING, default="bert-base-uncased",
              help="HF model name or local path for textual features")
@click.option("--image-model", type=click.STRING, default="inception_v4",
              help="timm model name for visual features")
@click.option("--feature-device", type=click.STRING, default="cpu")
@click.option("--download", is_flag=True, default=False,
              help="download the Amazon 5-core dump when reviews are absent")
def preprocess(
    raw_dir,
    out_dir,
    dataset_name,
    min_common_users,
    split_date,
    test_size,
    seed,
    extract_features,
    text_model,
    image_model,
    feature_device,
    download,
):
    """Offline preprocessing: reviews → item graph + splits + features
    (replaces the reference notebook pipeline, SURVEY.md §3.5)."""
    from pmgt_tpu.data.preprocess import run_preprocess

    run_preprocess(
        raw_dir=raw_dir,
        out_dir=out_dir,
        dataset_name=dataset_name,
        min_common_users=min_common_users,
        split_date=split_date,
        test_size=test_size,
        seed=seed,
        extract_features=extract_features,
        text_model=text_model,
        image_model=image_model,
        feature_device=feature_device,
        download=download,
    )


@cli.command(context_settings={"show_default": True}, name="scrape-images")
@click.option("--meta-path", type=click.Path(exists=True), required=True,
              help="metadata dump (one JSON per line) with asin + image urls")
@click.option("--image-dir", type=click.Path(), required=True)
@click.option("--max-workers", type=click.INT, default=8)
@click.option("--max-retries", type=click.INT, default=4)
@click.option("--backoff", type=click.FLOAT, default=0.5)
def scrape_images_cmd(meta_path, image_dir, max_workers, max_retries, backoff):
    """Parallel product-image download with exponential backoff
    (reference notebook cell 12)."""
    from pmgt_tpu.data.ingest import load_image_urls, scrape_images

    urls = load_image_urls(meta_path)
    logger.info("found image urls for %d items", len(urls))
    scrape_images(
        urls,
        image_dir,
        max_workers=max_workers,
        max_retries=max_retries,
        backoff=backoff,
    )
