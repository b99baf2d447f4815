"""spark-submit smoke job: the north star's deployment mode — the engine
arrives ONLY via --py-files (no PYTHONPATH), runs the flagship pipeline
shape on synthesized pages, and prints a checkable line."""
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
from geostatssolvers_jl_spark.distances import Haversine
from geostatssolvers_jl_spark.grid import CartesianGrid
from geostatssolvers_jl_spark.operators.kriging import KrigingModel, solve_kriging
from geostatssolvers_jl_spark.sources.pages import geocode, synthesize_pages
from geostatssolvers_jl_spark.variogram import GaussianVariogram

pg = geocode(synthesize_pages(spark, 400), res=6)
pagesdf = pg.selectExpr("doc_id AS data_id", "lon", "lat",
                        "CAST(length(text) AS DOUBLE) AS z", "cell")
grid = CartesianGrid.from_extent((-180.0, -90.0), (180.0, 90.0), (72, 36))
sol = solve_kriging(
    pagesdf, grid.spark_df(spark, scramble=True, num_partitions=8),
    model=KrigingModel(variogram=GaussianVariogram(range=2000.0, sill=1e4)),
    data_coord_cols=["lon", "lat"], maxneighbors=8,
    metric=Haversine(6371.0), strategy="local-broadcast",
)
n = sol.count()
nn = sol.filter("z IS NOT NULL").count()
print(f"SUBMIT_SMOKE rows={n} non_null={nn}")
spark.stop()
