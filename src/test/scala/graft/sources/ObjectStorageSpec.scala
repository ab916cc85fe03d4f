package graft.sources

import graft.SparkSpec

class ObjectStorageSpec extends SparkSpec {

  test("configureS3a lands the fs.s3a settings in the Hadoop conf") {
    ObjectStorage.configureS3a(spark, ObjectStorage.S3Config(
      endpoint = "http://localhost:9000", accessKey = "ak", secretKey = "sk"))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") === "http://localhost:9000")
    assert(hc.get("fs.s3a.path.style.access") === "true")
    assert(hc.get("fs.s3a.committer.name") === "directory")
  }

  test("list walks a local tree recursively; missing path is empty") {
    val dir = tmpDir("lsroot")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "xy")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "sub"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "sub", "b.txt"), "z")
    val files = ObjectStorage.list(spark, dir)
    assert(files.map(f => f._1.split('/').last -> f._2).toSet === Set("a.txt" -> 2L, "b.txt" -> 1L))
    assert(ObjectStorage.list(spark, s"$dir/none") === Seq.empty)
  }
}
