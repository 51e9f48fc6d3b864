"""Source readers (CIViC TSV, cBioPortal JSON, 1000G VEP JSONL) and sinks
(KGX JSONL, Neo4j/Neptune typed CSV), re-expressed as DataFrame programs."""
