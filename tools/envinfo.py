"""Environment fingerprint block for committed artifacts (r12 verdict
task 6: two rounds were lost to an invisible environment delta between
the builder sandbox and the driver — record every version that can
shift an engine primitive, in every artifact, forever)."""

from __future__ import annotations

import platform
import sys
import unicodedata


def env_fingerprint(spark=None) -> dict:
    info: dict = {
        "python": sys.version.split()[0],
        "python_unicodedata": unicodedata.unidata_version,
        "platform": platform.platform(),
    }
    for mod in ("duckdb", "pandas", "numpy", "pyarrow", "pyspark"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "?")
        except Exception:  # noqa: BLE001
            info[mod] = None
    if spark is not None:
        try:
            info["spark"] = spark.version
            jsys = spark.sparkContext._jvm.java.lang.System  # noqa: SLF001
            for k in ("java.version", "java.vendor", "java.vm.name"):
                info[k] = jsys.getProperty(k)
        except Exception:  # noqa: BLE001
            pass
    return info
