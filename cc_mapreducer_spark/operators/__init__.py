"""Operator modules. Importing this package registers every query/oracle
pair with cc_mapreducer_spark.registry (side-effect imports below)."""

import cc_mapreducer_spark.operators.anagram  # noqa: F401
import cc_mapreducer_spark.operators.bloom  # noqa: F401
import cc_mapreducer_spark.operators.bpe  # noqa: F401
import cc_mapreducer_spark.operators.cdc  # noqa: F401
import cc_mapreducer_spark.operators.clustering  # noqa: F401
import cc_mapreducer_spark.operators.collocations  # noqa: F401
import cc_mapreducer_spark.operators.consolidated  # noqa: F401
import cc_mapreducer_spark.operators.curation  # noqa: F401
import cc_mapreducer_spark.operators.semantic  # noqa: F401
import cc_mapreducer_spark.operators.dedup  # noqa: F401
import cc_mapreducer_spark.operators.dq  # noqa: F401
import cc_mapreducer_spark.operators.dsir  # noqa: F401
import cc_mapreducer_spark.operators.features  # noqa: F401
import cc_mapreducer_spark.operators.graph  # noqa: F401
import cc_mapreducer_spark.operators.heavyhitters  # noqa: F401
import cc_mapreducer_spark.operators.linkage  # noqa: F401
import cc_mapreducer_spark.operators.mmr  # noqa: F401
import cc_mapreducer_spark.operators.multimodal  # noqa: F401
import cc_mapreducer_spark.operators.pq  # noqa: F401
import cc_mapreducer_spark.operators.quality_lm  # noqa: F401
import cc_mapreducer_spark.operators.relational  # noqa: F401
import cc_mapreducer_spark.operators.search  # noqa: F401
import cc_mapreducer_spark.operators.relational_extra  # noqa: F401
import cc_mapreducer_spark.operators.sessionize  # noqa: F401
import cc_mapreducer_spark.operators.setsim  # noqa: F401
import cc_mapreducer_spark.operators.stateful  # noqa: F401
import cc_mapreducer_spark.operators.temporal  # noqa: F401
import cc_mapreducer_spark.operators.timeseries  # noqa: F401
import cc_mapreducer_spark.operators.tpch_full  # noqa: F401
import cc_mapreducer_spark.operators.tpch_more  # noqa: F401
import cc_mapreducer_spark.operators.similarity  # noqa: F401
import cc_mapreducer_spark.operators.text_analysis  # noqa: F401
import cc_mapreducer_spark.operators.winnow  # noqa: F401
import cc_mapreducer_spark.streaming.events  # noqa: F401
import cc_mapreducer_spark.streaming.stateful  # noqa: F401
