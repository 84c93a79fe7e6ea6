from .session import get_spark
from .partitioning import salted_repartition, stable_order_within_partitions
