"""End-to-end query plans, one module per family:

relational_core — one query per reference golden test (filter, join,
                  aggregate, vcat, count-distinct, ...)
bigbench        — BigBench Q05 / Q25 / Q26 analogues (the reference's
                  benchmark queries) on the fixture star schema
tpch            — TPC-H-style headline queries (pricing summary, topk)
windowed        — stencil / cumsum / rank / sessionization plans
text_pipeline   — dedup + text-analysis plans over `documents`
similarity      — embedding similarity / ANN plans over `embeddings`
"""
