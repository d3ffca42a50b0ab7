"""Profile pipeline_assembly through the real registry query at sf0.1."""
import time

from djangoadmin_postgresql_2_elasticseach_spark import registry
from djangoadmin_postgresql_2_elasticseach_spark.session import get_spark

spark = get_spark(app_name="profile", extra_conf={
    "spark.cleaner.referenceTracking": "false",
    "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

SF = "/root/testdata/sf0.1"
registry._docs(spark, SF).count()  # warm scan

for run in range(5):
    t0 = time.time()
    df = registry.QUERIES["pipeline_assembly"](spark, SF)
    df.write.format("noop").mode("overwrite").save()
    print(f"run{run}: {time.time()-t0:6.2f}s")
