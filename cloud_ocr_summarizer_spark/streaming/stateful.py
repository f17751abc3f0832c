"""Custom stateful streaming operator: first-occurrence dedup.

``applyInPandasWithState`` keeps one tiny state cell per fingerprint
group ("seen before?"); only the first document carrying a fingerprint is
emitted across the whole stream lifetime — the streaming twin of
dedup.exact_duplicates for continuously-arriving corpora.

State is per-group and partitioned by Spark's state store; at 10^12 docs
the fingerprint space shards across executors with no driver state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_occurrence(
    stream: DataFrame,
    *,
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """(doc_id, fingerprint) stream -> rows whose fingerprint is new.

    Within one micro-batch, the earliest doc_id wins (deterministic);
    across batches the state cell suppresses repeats.
    """

    def dedup(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        best: str | None = None
        for pdf in pdfs:
            cand = pdf["doc_id"].min()
            best = cand if best is None or cand < best else best
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame({"fingerprint": [key[0]], "doc_id": [best]})

    return (
        stream.select("doc_id", fingerprint_col)
        .groupBy(fingerprint_col)
        .applyInPandasWithState(
            dedup,
            outputStructType="fingerprint string, doc_id string",
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
