"""Extension tier — beyond the reference's surface (charter requirements):
LLM-data-pipeline operators (text analysis, dedup, similarity search,
multimodal columns), window functions, event-time windows, streaming.

Design rule for every operator here: express it as a composition of
built-in DataFrame ops (JVM-side, whole-stage-codegen'd) first; drop to
Arrow-batched Pandas UDFs only where built-ins genuinely can't (multimodal
decode); never row-at-a-time Python UDFs, never driver-side loops.
"""
