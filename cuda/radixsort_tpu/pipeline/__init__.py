"""Query-pipeline layer: composed operators, per-stage stats, overlap control."""
