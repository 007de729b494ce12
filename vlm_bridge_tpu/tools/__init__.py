"""Debug / ops tooling (reference repo-root debug scripts)."""
