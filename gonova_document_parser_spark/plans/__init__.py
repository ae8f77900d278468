from .partitioning import host_of, plan_extraction_partitions, spread_by_url, with_host_salt

__all__ = ["spread_by_url", "plan_extraction_partitions", "with_host_salt", "host_of"]
