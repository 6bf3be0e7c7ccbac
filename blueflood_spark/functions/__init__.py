from blueflood_spark.functions.glob import glob_to_regex, next_level_regex  # noqa: F401
from blueflood_spark.functions.hashing import safe_div, shard_of, shard_expr  # noqa: F401
from blueflood_spark.functions.datetime_parser import parse_datetime  # noqa: F401
