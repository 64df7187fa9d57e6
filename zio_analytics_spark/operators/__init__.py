"""Operators beyond the thin DataFrame passthroughs.

Reference core:

- :mod:`accumulate` — reference ``MapAccumulate`` (stateful ordered scan).

[EXT] relational / analytics:

- :mod:`asof` — as-of joins (backward/forward/nearest, tolerance).
- :mod:`topk` — top-k, per-group top-k, weighted sampling (A-ES).
- :mod:`analytics` — funnels (incl. deadlines), retention, gap-fill,
  Markov event transitions, session paths.
- :mod:`timeseries` — cascading rollups, linear gap interpolation.
- :mod:`sketch` — heavy hitters, equi-depth binning.
- :mod:`skew` — hot-key salting (join + two-phase agg).
- :mod:`merge` — MERGE/upsert, SCD2, symmetric table diff.
- :mod:`graph` — PageRank (edge-list message passing).
- :mod:`robust` — winsorization, MAD outliers.
- :mod:`profiling` — one-pass table profiles, PSI drift.
- :mod:`layout` — Z-order + Hilbert clustered writes, contiguous ids,
  exact global cumsum, small-files compaction planning.
- :mod:`geo` — haversine radius join via grid-cell blocking.
- :mod:`linkage` — SymSpell fuzzy join + sorted-neighborhood blocking.
- :mod:`stats` — Welch/chi²/AUC/OLS/Theil–Sen/moments/confusion/
  calibration/Kaplan–Meier/log-rank/Poisson-bootstrap CI.

[EXT] LLM-data pipeline:

- :mod:`dedup` — exact + near-duplicate detection, incremental ingest,
  decontamination.
- :mod:`similarity` / :mod:`ann_index` — embedding search (brute force,
  LSH/IVF, precomputed partition-pruned layouts).
- :mod:`pq` — product quantization (per-subspace codebooks, ADC search)
  and the composed IVF-PQ stack (coarse cells + residual codes).
- :mod:`text` — tokens, quality, lang-id, fingerprints, shingles,
  packing, unigram-LM scores, TF-IDF, token budgets.
- :mod:`bpe` — BPE tokenizer TRAINING (corpus-scale merge learning) and
  application via the segmented-vocab dimension join.
- :mod:`cleaning` — PII redaction, normalization, weighted source mixing.
- :mod:`splits` — content-hash dataset splits.
- :mod:`multimodal` — binary columns + real BMP/PPM/PNG (full depth/color
  matrix)/WAV (PCM, G.711, IMA ADPCM)/Y4M decode; resize + re-encode,
  perceptual hash, framed audio features, DTMF detection, scene cuts.
"""
