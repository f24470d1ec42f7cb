from sifts_spark.pipelines.curation import curate_corpus

__all__ = ["curate_corpus"]
