"""Operator modules. Importing this package registers every query/oracle
pair with cc_mapreducer_spark.registry (side-effect imports below)."""

import cc_mapreducer_spark.operators.anagram  # noqa: F401
import cc_mapreducer_spark.operators.relational  # noqa: F401
