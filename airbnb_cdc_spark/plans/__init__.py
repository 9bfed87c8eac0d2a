"""Pipeline orchestration (the reference's control-flow layer, §2.7)."""
