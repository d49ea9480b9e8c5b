"""Bench helper package. The top-level ``bench.py`` harness is shadowed
by this package on the import path, so re-export its session builder
here for the scaling/kernel scripts."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_main",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    ),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
build_spark = _mod.build_spark
build_gml_fixtures = _mod.build_gml_fixtures
py_worker_rss_mb = _mod.py_worker_rss_mb
