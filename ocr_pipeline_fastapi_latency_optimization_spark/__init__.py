"""PySpark-native main-content extraction engine.

A from-scratch re-expression of the computation shape of the reference
repo ``Ashokpravin/ocr-pipeline-fastapi-Latency-optimization`` (an async
document→markdown OCR service) as an idiomatic Spark batch engine over
tables of multi-turn transcripts:

* classify each turn's payload (plain / html-ish / pdf-layout JSON),
* tokenize it into blocks (the analog of layout detection, DLA.py:137-148),
* score + merge blocks with density/geometry heuristics (DLA.py:152-177),
* mask boilerplate blocks (ContentMasker.py:60-62 analog),
* stamp sentinel placeholders for preserved table/figure blocks
  (ContentMasker.py:64-80 analog),
* serialize + re-inject preserved blocks via a left equi-join
  (MarkdownEnricher.py:29-67 analog),
* stitch turns per conversation in stable order (PageProcessor.py:112).

Every behavior lives in a pure pandas/numpy function; Spark
(``mapInPandas`` / DataFrame joins) and the single-node pandas oracle are
two thin drivers over the same library, which is what makes per-turn
bit-equality achievable by construction.

No code is copied from the reference; ``file:line`` citations in
docstrings point at the behavior being re-expressed.
"""

__version__ = "0.1.0"
