package graft

import graft.config.{Pipeline, PipelineCfg}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end config-driven pipeline over the testdata — the op-etl
  * workflow (config.yaml → download/stage → process → truncate-load →
  * summary; run.py) as one declarative JSON document. Exercises the JSON
  * parser, filtered staging, OID-sweep ingest and truncate-load, and
  * returns the per-source monitoring summary.
  */
object PipelineDemo {
  def run(spark: SparkSession, dir: String): DataFrame = {
    val json =
      s"""{
         |  "sources": [
         |    {"name": "orders_f", "path": "$dir/orders.parquet",
         |     "where": "o_orderstatus = 'F'"},
         |    {"name": "lineitem_swept", "path": "$dir/lineitem.parquet",
         |     "where": "l_quantity >= 45",
         |     "oidSweep": {"keyColumn": "l_orderkey", "batches": 16}},
         |    {"name": "customer_seg", "path": "$dir/customer.parquet",
         |     "select": ["c_custkey", "c_name", "c_mktsegment"],
         |     "where": "c_mktsegment = 'BUILDING'"},
         |    {"name": "disabled_src", "path": "$dir/region.parquet", "enabled": false}
         |  ],
         |  "load": {"target": "/root/repo/target/graft_pipeline", "mode": "truncate"}
         |}""".stripMargin
    Pipeline.run(spark, PipelineCfg.fromJson(json))
  }
}
