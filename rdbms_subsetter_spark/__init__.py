"""rdbms_subsetter_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of 18F/rdbms-subsetter.

The reference (``subsetter.py``, ~650 LoC, row-at-a-time recursive
FK-closure sampler) is re-expressed set-at-a-time on Spark DataFrames:
seeded sampling, FK-closure fixpoint via iterative ``left_semi`` joins,
per-parent capped child pulls via window top-k, and topologically
ordered writes.  Beyond the reference surface, the ``operators``
package adds the LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

All behavior is derived from public knowledge of the upstream repo
(github.com/18F/rdbms-subsetter, CC0) and the Apache Spark API.
"""

# Import order is load-bearing: _blas sets OPENBLAS/OMP thread-count
# env defaults BEFORE anything pulls in numpy, so every process that
# imports this package gets one-BLAS-thread-per-task discipline.
from rdbms_subsetter_spark import _blas as _blas  # noqa: F401

from rdbms_subsetter_spark.constraints import ConstraintRegistry, ForeignKey
from rdbms_subsetter_spark.catalog import Catalog

__version__ = "0.1.0"

__all__ = ["ConstraintRegistry", "ForeignKey", "Catalog", "__version__"]
