from cc_mapreducer_spark.functions.text import (
    STOP_WORDS,
    anagram_signature,
    stop_words_sql_list,
    tokens,
)

__all__ = ["STOP_WORDS", "anagram_signature", "stop_words_sql_list", "tokens"]
