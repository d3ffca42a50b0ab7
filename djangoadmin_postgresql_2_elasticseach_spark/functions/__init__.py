"""Column-level function library: text analysis chain, token statistics,
hashing/fingerprinting. All native Column expressions (JVM-side,
whole-stage-codegen) — no Python row UDFs."""
