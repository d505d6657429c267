"""Pure-Python document logic — importable without Spark.

Everything here is called batch-at-a-time from Arrow-fed pandas UDFs in
``operators/``; nothing in this package imports pyspark, so the whole
extraction core unit-tests directly under plain pytest.
"""
