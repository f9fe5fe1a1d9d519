"""Extract the JVM's Unicode script-class membership as explicit
codepoint ranges (the generator behind text.py's PINNED_*_CLASS).

Java's ``\\p{IsLatin}`` / ``\\p{IsHan}`` / ``\\p{IsCyrillic}`` follow
the JDK's Unicode tables (JDK 17 = Unicode 13.0); DuckDB's RE2 ships
newer tables, so the engine-native spellings disagree on Unicode-14/15
additions (e.g. U+A7C0, U+9FFD..U+9FFF, U+1E030+). The pin freezes the
JVM's CURRENT behavior as explicit ranges both engines interpret
identically — run this after a JDK/Spark upgrade and diff the output
against ``_LATIN_RANGES`` / ``_HAN_RANGES`` / ``_CYRILLIC_RANGES`` in
``functions/text.py``; a non-empty diff means the JDK's Unicode tables
moved and the pinned constants (plus every committed oracle hash that
counts script chars) need a deliberate, documented bump.

Usage: python tools/pin_scripts.py
"""

from __future__ import annotations

from pyspark.sql import functions as F


def jvm_script_ranges(spark, java_class: str) -> list[tuple[int, int]]:
    """All codepoints matching the given Java regex class, as closed
    ranges — one Spark job over the full scalar range (surrogates
    excluded), so the answer is the JVM's own, not a transcription."""
    cps = spark.range(0, 0x110000).where(~F.col("id").between(0xD800, 0xDFFF))
    ch = F.decode(F.unhex(F.lpad(F.hex("id"), 8, "0")), "UTF-32")
    ids = [
        r["id"]
        for r in cps.select("id")
        .where(F.regexp_count(ch, F.lit(java_class)) == 1)
        .orderBy("id")
        .collect()
    ]
    out: list[list[int]] = []
    for i in ids:
        if out and i == out[-1][1] + 1:
            out[-1][1] = i
        else:
            out.append([i, i])
    return [(a, b) for a, b in out]


def main() -> None:
    from skylinemapreducehadoop_spark.functions import text as TX
    from skylinemapreducehadoop_spark.session import get_session

    spark = get_session()
    pinned = {
        "LATIN": TX._LATIN_RANGES,
        "HAN": TX._HAN_RANGES,
        "CYRILLIC": TX._CYRILLIC_RANGES,
    }
    for name, java_class in (
        ("LATIN", r"\p{IsLatin}"),
        ("HAN", r"\p{IsHan}"),
        ("CYRILLIC", r"\p{IsCyrillic}"),
    ):
        got = jvm_script_ranges(spark, java_class)
        print(f"_{name}_RANGES: tuple = (")
        for a, b in got:
            print(f"    (0x{a:X}, 0x{b:X}),")
        print(")")
        match = tuple(got) == tuple(pinned[name])
        print(f"# matches pinned constant: {match}")
        if not match:
            print("# *** JDK Unicode tables moved — see module docstring ***")
    spark.stop()


if __name__ == "__main__":
    main()
