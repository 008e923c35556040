"""Data layer: artifact formats, interaction tables, synthetic datasets,
offline preprocessing, ingestion, and feature extraction.

Replaces the reference's L0/L1 layers (notebooks/PMGT.ipynb +
pmgt/{ncf,dcn}/datasets.py + pmgt/preprocessing/) with host-side numpy
preprocessing that emits fixed-shape arrays; all hot-path sampling lives
in ``pmgt_tpu.sampling`` as jitted device code.
"""
