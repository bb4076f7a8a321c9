from cc_mapreducer_spark.sources.text_corpus import read_text_corpus, read_wholetext_corpus

__all__ = ["read_text_corpus", "read_wholetext_corpus"]
