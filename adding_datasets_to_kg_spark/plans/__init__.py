"""End-to-end pipeline plans + the canned query library."""
