"""Arrow Flight RPC layer: server, client loops, and the mirror replicator
(reference: icerunner.py:262-310, 716-800, 846-1156)."""
