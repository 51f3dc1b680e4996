"""research_knowledge_graph_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of the reference repo
``cheersanimesh/research_knowledge_graph`` (surveyed in /root/repo/SURVEY.md) as
streaming ``ray.data.Dataset`` pipelines: batched mention detection and
(subj, pred, obj) triple extraction over interleaved text+media span documents,
label normalization/validation, alias+embedding entity linking with
connected-component canonicalization, cross-document relationship linking via
shared-entity blocking, and materialization of deduplicated node/edge tables.

Everything here is built on public APIs only (Ray Data, PyArrow, NumPy, pandas).
No code is copied from the reference; reference file:line citations in docstrings
mark *semantic* parity points for auditing.
"""

__version__ = "0.1.0"
