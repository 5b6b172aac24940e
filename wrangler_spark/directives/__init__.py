"""Builtin directive implementations, grouped by family.

Importing this package registers every system directive — the Python
equivalent of the reference's classpath scan
(``wrangler-core/.../registry/SystemDirectiveRegistry.java:51-66``).
"""

from wrangler_spark.directives import (  # noqa: F401
    advanced,
    aggregates,
    columns,
    datapipe_ops,
    datetime_ops,
    encoding,
    extensions,
    lookups,
    masks,
    parsers,
    rows,
    transforms,
    writers,
)
