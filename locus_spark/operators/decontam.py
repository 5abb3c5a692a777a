"""Train/eval decontamination — remove training documents that share word
n-grams with an evaluation set.

The canonical LLM-pipeline hygiene step (the reference engine has no
analogue; this extends the dedup family of SURVEY §2's pipeline surface):
any training document sharing at least one ``shingle``-word n-gram with any
eval document is dropped before training, so benchmark answers cannot leak
into the training mix.

Scale shape (100 TB training side, ~1e4–1e6 eval docs):

* The EVAL side is small by contract (benchmark suites), so its distinct
  shingle set is broadcast — the training table's (doc_id, shingle) rows are
  never shuffled for the membership probe (map-side ``left_semi`` against
  the broadcast hash set).
* Contaminated ids then remove their documents with a key anti-join — one
  shuffle on ``doc_id`` (or a broadcast, when few docs are contaminated;
  AQE picks at runtime).
* No all-pairs anything: cost is O(train shingles) + O(contaminated ids).

Shingling reuses :func:`locus_spark.operators.dedup._doc_shingles` (distinct
word n-grams over whitespace tokens, 1-indexed like the DuckDB oracle's
lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from locus_spark.operators.dedup import _doc_shingles

#: word-n-gram width for contamination matching.  Real pipelines use 8-13
#: word n-grams; the synthetic fixture's documents are short (tens of
#: tokens from a small vocabulary), so 4 keeps the match rate in the same
#: regime a 13-gram has against web text.
DECON_SHINGLE = 4


def contaminated_ids(
    train: DataFrame,
    eval_docs: DataFrame,
    shingle: int = DECON_SHINGLE,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Distinct ``doc_id`` of training documents sharing at least one
    ``shingle``-word n-gram with any eval document.

    ``broadcast_eval=True`` (default) hash-broadcasts the distinct eval
    shingle set — right for suite-sized eval sets (≲ a few hundred MB of
    shingles); the training side then streams map-side with no shuffle.
    For very large eval sets (~1e6 docs ⇒ ~1e8 shingles, beyond broadcast)
    pass ``False``: a plain shuffle ``left_semi`` on the shingle key, the
    standard repartition-join shape, still O(shingles) with no all-pairs."""
    ev_sh = _doc_shingles(eval_docs, shingle).select("shingle").distinct()
    if broadcast_eval:
        ev_sh = F.broadcast(ev_sh)
    return (
        _doc_shingles(train, shingle)
        .join(ev_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    shingle: int = DECON_SHINGLE,
    broadcast_eval: bool = True,
) -> DataFrame:
    """The surviving training set: ``train`` minus every document flagged by
    :func:`contaminated_ids`.  Documents with fewer than ``shingle`` tokens
    carry no n-gram and are always kept (mirrored by the oracle)."""
    bad = contaminated_ids(train, eval_docs, shingle, broadcast_eval)
    return train.join(bad, "doc_id", "left_anti")
