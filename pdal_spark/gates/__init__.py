"""Oracle-gate harness — the driver-contract surface (queries() /
oracle_sql() entries), kept OUT of the engine proper: these modules
define cross-engine verification gates, not operators. Engine code
lives in pdal_spark/{operators,sources,functions,plans,streaming};
LoC accounting for the engine excludes this subpackage.

Loaded by pdal_spark.gate in a flat numeric loop (import order IS
registry order — see gate.py:1050-1070). Importing any gate_ext
module directly first runs that loader to completion (the import
below), so cross-module `from ... import` references resolve
regardless of which module a test imports first."""

import pdal_spark.gate  # noqa: F401,E402 - completes the registry
