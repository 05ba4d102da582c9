"""Named query plans: the engine's acceptance surface.

``relational`` re-expresses the reference's operator inventory
(SURVEY.md §2) over the driver testdata; ``analyst`` ships the
reference's sql/example_queries.sql shapes over the gold table;
``text_ops`` / ``vector_ops`` cover the training-data extensions.
"""
