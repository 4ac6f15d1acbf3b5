package graft

import graft.config.{LoadCfg, Pipeline, PipelineCfg, SourceCfg, StepsCfg}
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the declarative pipeline (SURVEY H1): JSON parsing, step
  * gating (run.py --download/--process/--load_sde), cleanup semantics. */
class PipelineSpec extends AnyFunSuite with SparkTestBase {

  private val target = "/root/repo/target/graft_pipeline_spec"

  test("config JSON parses with defaults and unknown fields ignored") {
    val cfg = PipelineCfg.fromJson(
      s"""{"sources": [{"name": "r", "path": "$sfDir/region.parquet",
         |  "futureOption": 1}]}""".stripMargin)
    assert(cfg.sources.head.enabled && cfg.steps.load && !cfg.cleanupBeforeRun)
  }

  test("load step gating: disabled load counts rows but writes nothing") {
    val marker = new java.io.File(s"$target/gated")
    val cfg = PipelineCfg(
      sources = Seq(SourceCfg(name = "gated", path = s"$sfDir/region.parquet")),
      load = Some(LoadCfg(target)), steps = StepsCfg(load = false),
      cleanupBeforeRun = true)
    val out = Pipeline.run(spark, cfg).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("gated", 5L)))
    assert(!marker.exists(), "load was gated off but the target was written")
  }

  test("cleanup before run removes stale targets") {
    val stale = new java.io.File(s"$target/stale_dir")
    stale.mkdirs()
    val cfg = PipelineCfg(
      sources = Seq(SourceCfg(name = "nation", path = s"$sfDir/nation.parquet")),
      load = Some(LoadCfg(target)), cleanupBeforeRun = true)
    Pipeline.run(spark, cfg).collect()
    assert(!stale.exists(), "cleanupBeforeRun should clear the target tree")
    assert(new java.io.File(s"$target/nation").exists())
  }

  test("name sanitization applies to loaded table names and columns") {
    assert(Pipeline.safeNameString("Övre Vägen 7!") == "vre_v_gen_7")
    assert(Pipeline.safeNameString("7eleven") == "fc_7eleven")
    assert(Pipeline.safeNameString("") == "unnamed_fc")
  }
}
