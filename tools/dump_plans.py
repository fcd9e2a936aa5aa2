"""Dump .explain('formatted') for the round-8-touched query plans.

Usage: python tools/dump_plans.py <out_dir> <suffix>
  e.g. python tools/dump_plans.py plans/r08 after

Captures the BARE face/query helpers (the entries whose plans the r8
optimizations changed). Merged entries that execute eager gates inside
their helper are represented by their faces — the returned frame of a
checkpointing entry is a LogicalRDD stub, which carries no plan
information. profile_columns / profile_spans (the validate-pass
operators) are captured over a small synthetic documents frame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "q_token_stats_by_lang__distinctive",
    "q_token_stats_by_lang__collocations",
    "q_lm_perplexity",
    "q_text_doc_features__features",
    "q_text_doc_features__gopher",
    "q_text_doc_features__url",
    "q_jaccard_pairs_sample",
    "q_pii_scrub",
    "q_substring_dedup__cross",
    "q_substring_dedup__intra",
    "q_chunk_documents__ws",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)

    from schema_drift_detector_spark.session import get_spark

    spark = get_spark(
        "dump-plans",
        master="local[4]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    def dump(name: str, df) -> None:
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name)

    for q in QUERIES:
        fn = getattr(E, q, None)
        if fn is None:
            print("skip (absent):", q)
            continue
        try:
            dump(q.removeprefix("q_"), fn(spark, SF_DIR))
        except Exception as ex:
            print("ERROR", q, str(ex)[:100])

    # the broadcast-hint removal (distinctive/pmi vocab sides) is
    # invisible at sf0.1 under the default threshold — AQE still picks
    # broadcast because the side IS small here. Dump the same plans
    # with autoBroadcastJoinThreshold=-1: a forced hint still plans
    # BroadcastHashJoin there; the un-hinted r8 form plans SortMergeJoin
    # (the 100 TB behavior).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for q in (
            "q_token_stats_by_lang__distinctive",
            "q_token_stats_by_lang__collocations",
        ):
            fn = getattr(E, q, None)
            if fn is not None:
                dump(q.removeprefix("q_") + "_threshold-1", fn(spark, SF_DIR))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # validate-pass operators over the synthetic bench table shape
    from schema_drift_detector_spark.operators.profile import (
        profile_columns,
        profile_spans,
    )
    from schema_drift_detector_spark.sources.synth import SynthConfig, synth_documents

    docs = synth_documents(spark, SynthConfig(n_docs=1000, n_partitions=4), epoch=0)
    dump("profile_columns", profile_columns(docs, snapshot_id="p", entity="documents"))
    dump("profile_spans", profile_spans(docs))
    spark.stop()


if __name__ == "__main__":
    main()
