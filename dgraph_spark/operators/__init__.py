"""Engine operators beyond the per-block executor: iterative graph
algorithms, vector similarity, dedup, and text-analysis pipeline ops.
"""
