"""Column-expression libraries (JVM-side, whole-stage-codegen friendly)."""
