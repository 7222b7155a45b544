"""Streaming admission control for the URL/domain curation family.

The batch family (`plans/url.py`) caps every registrable domain at k
documents chosen by md5 rank — a whole-corpus decision. An INGEST
pipeline can't see the whole corpus: admission is first-come within
each domain, decided per document as it arrives. This module is that
streaming member (VERDICT r10 #7): a per-domain running admitted-count
carried as keyed state, the same one-scalar-per-key state-store shape
as `events_stream.ewma_stream` and the flight session store.

Scale: state is ONE long per registrable domain — bounded by the
domain universe (model-sized: the web has ~10^8 registrable domains at
100 TB crawl scale, a few GB of state store across 1000 executors,
partitioned by the groupBy key), not by stream length. Admitted rows
emit append-mode exactly once; rejected rows are dropped inside the
Arrow kernel, so an over-cap crawl loop costs its batch rows only —
nothing accumulates.

Ordering contract: within a micro-batch, documents fold in (ts, id)
order; across batches, arrival order IS admission order (the state
count is cumulative). For any split of a per-domain (ts, id)-ordered
log into micro-batches, the admitted set equals the batch twin
`domain_admission_batch` — proven over random splits in
tests/test_curation_stream.py. An out-of-order feed admits by arrival,
which is the production semantics of admission control (put the batch
cap in front if you need global rank semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ADMISSION_SCHEMA = (
    "domain string, doc_id long, ts timestamp, admitted_rank long"
)


def domain_admission_stream(
    docs: DataFrame,
    cap: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Admit the first ``cap`` documents per domain, streaming.

    Emits one row per ADMITTED document — (domain, doc_id, ts,
    admitted_rank) with 1-based rank in admission order; documents
    arriving after their domain's cap is spent are dropped. State per
    domain is a single carried long (the admitted count so far).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = docs.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col).alias("doc_id"),
        F.col(ts_col).alias("ts"),
    )

    def _admit(key, pdf_iter, state: "GroupState"):
        import pandas as pd

        frames = [p for p in pdf_iter if not p.empty]
        if not frames:
            return
        taken = int(state.get[0]) if state.exists else 0
        if taken >= cap:
            # domain budget already spent: drop the whole batch without
            # touching the frames beyond the emptiness probe
            return
        pdf = (
            pd.concat(frames)
            .sort_values(["ts", "doc_id"], kind="mergesort")
            .head(cap - taken)
        )
        n = len(pdf)
        out = pdf.assign(admitted_rank=range(taken + 1, taken + n + 1))
        state.update((taken + n,))
        yield out[["domain", "doc_id", "ts", "admitted_rank"]]

    return src.groupBy("domain").applyInPandasWithState(
        _admit,
        outputStructType=ADMISSION_SCHEMA,
        stateStructType="taken long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def domain_admission_batch(
    docs: DataFrame,
    cap: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin: the first ``cap`` documents per domain in (ts, id)
    order — what the stream admits when the log replays in order.

    Scale: the rn <= cap filter on a constant lowers to the map-side
    WindowGroupLimit (the q_domain_caps plan shape), so a head domain
    costs a top-k heap per task, never a full per-domain sort.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(F.col(domain_col)).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    return (
        docs.select(
            F.col(domain_col).alias("domain"),
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("ts"),
        )
        .withColumn("admitted_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("admitted_rank") <= cap)
    )
