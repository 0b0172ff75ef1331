"""PySpark-native knowledge-graph construction engine with the semantics of
paramitamirza/EventRelationExtractor (CATENA): event/temporal/causal relation
extraction over Common-Crawl-style web pages, emitting (subj, pred, obj)
triples with TimeML-vocabulary predicates."""

__version__ = "0.1.0"
