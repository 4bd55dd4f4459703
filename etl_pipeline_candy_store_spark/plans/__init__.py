"""Query plans: the conformance-query catalog and the candy pipeline."""
