from linkedin_iceberg_spark.transforms.transforms import (
    Transform,
    IdentityTransform,
    BucketTransform,
    TruncateTransform,
    YearTransform,
    MonthTransform,
    DayTransform,
    HourTransform,
    VoidTransform,
    UnknownTransform,
    parse_transform,
)
from linkedin_iceberg_spark.transforms.bucket_hash import murmur3_32, bucket_hash_bytes

__all__ = [
    "Transform", "IdentityTransform", "BucketTransform", "TruncateTransform",
    "YearTransform", "MonthTransform", "DayTransform", "HourTransform",
    "VoidTransform", "UnknownTransform", "parse_transform",
    "murmur3_32", "bucket_hash_bytes",
]
