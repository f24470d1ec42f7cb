"""Build and ship the pretrained 53-language langid artifact.

Usage: python tools/make_langid_artifact.py [out_path]
(default artifacts/langid53.json — committed, so a recipe user gets
real multilingual gating in one kwarg:
``prepare_training_data(..., langid_model="artifacts/langid53.json")``).

Training data is the deterministic 53-language / 13-script synthetic
corpus (tools/langid50.py pools — the same floors the pytest suite
pins); the model is the hashed-char-n-gram softmax classifier
(operators/textanalysis.train_langid, dim 2^13). Held-out accuracy on
FRESH draws from the same pools is printed and must clear 0.90 or the
artifact is not written.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts",
            "langid53.json",
        )
    )
    from sifts_spark.functions.artifacts import save_artifact
    from sifts_spark.operators import textanalysis as TA
    from sifts_spark.session import get_spark
    from tools.langid50 import N_LANGS, corpus_rows

    spark = get_spark(
        "make-langid-artifact",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    train = spark.createDataFrame(
        corpus_rows(n_per_lang=60), "doc_id long, text string, lang string"
    )
    model = TA.train_langid(train, sample_per_lang=200, dim=2**13)
    assert len(model["langs"]) == N_LANGS, (len(model["langs"]), N_LANGS)

    # held-out floor on fresh draws (different seed, same pools)
    test = spark.createDataFrame(
        corpus_rows(n_per_lang=8, seed=99),
        "doc_id long, text string, lang string",
    )
    scored = TA.langid_score(test, model, id_col="doc_id", text_col="text")
    hits = (
        scored.withColumnRenamed("id", "doc_id")
        .join(test.select("doc_id", "lang"), "doc_id")
        .selectExpr("CAST(pred_lang = lang AS INT) AS hit")
        .groupBy()
        .sum("hit")
        .first()[0]
    )
    n_test = test.count()
    acc = hits / n_test
    print(f"langs={len(model['langs'])} held_out_acc={acc:.4f} n={n_test}")
    if acc < 0.90:
        raise SystemExit(f"held-out accuracy {acc:.4f} below the 0.90 floor")
    save_artifact(spark, out, model)
    size = os.path.getsize(out) if os.path.exists(out) else -1
    print(f"wrote {out} ({size} bytes)")


if __name__ == "__main__":
    main()
