package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Paths

class NativeResolverSpec extends AnyFunSuite {

  // oss_registry.json shape (reference tap.py:410-421)
  private val registry =
    """{"sources":[
        {"dockerRepository":"airbyte/source-faker","dockerImageTag":"6.2.10",
         "remoteRegistries":{"pypi":{"packageName":"airbyte-source-faker","enabled":true}}},
        {"dockerRepository":"airbyte/source-exotic","dockerImageTag":"1.0.0",
         "remoteRegistries":{"pypi":{"packageName":"airbyte-source-exotic","enabled":false}}},
        {"dockerRepository":"airbyte/source-nopypi","dockerImageTag":"0.1.0"}]}"""

  test("registry lookup: pypi-enabled -> native, disabled/absent/unknown -> docker") {
    assert(NativeResolver.isNativeInRegistry(registry, "airbyte/source-faker"))
    assert(!NativeResolver.isNativeInRegistry(registry, "airbyte/source-exotic"))
    assert(!NativeResolver.isNativeInRegistry(registry, "airbyte/source-nopypi"))
    assert(!NativeResolver.isNativeInRegistry(registry, "airbyte/source-missing"))
  }

  test("decide: skip_native_check beats force_native beats registry; no registry -> docker") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val reg = Some(m.readTree(registry))
    assert(NativeResolver.decide("airbyte/source-faker", reg))
    assert(!NativeResolver.decide("airbyte/source-faker", reg, skipNativeCheck = true))
    assert(NativeResolver.decide("airbyte/source-missing", reg, forceNative = true))
    assert(!NativeResolver.decide("airbyte/source-faker", None)) // fetch failed -> docker
  }

  test("requirement string pins the tag except for latest (tap.py:394-399)") {
    assert(NativeResolver.requirementString("source-faker", "6.2.10") == "airbyte-source-faker~=6.2.10")
    assert(NativeResolver.requirementString("source-faker", "latest") == "airbyte-source-faker")
  }

  test("venv provisioning argv and resolved entry points") {
    val venv = Paths.get("/tmp/venv/source-faker")
    val cmds = NativeResolver.venvCommands(venv, "airbyte-source-faker~=6.2.10",
      python = Some("python3.11"))
    assert(cmds == Seq(
      Seq("virtualenv", "-p", "python3.11", "/tmp/venv/source-faker"),
      Seq("/tmp/venv/source-faker/bin/pip", "install", "airbyte-source-faker~=6.2.10")))
    assert(NativeResolver.connectorCommand(native = true, "source-faker", venv,
      "airbyte/source-faker", "6.2.10") == Seq("/tmp/venv/source-faker/bin/source-faker"))
    assert(NativeResolver.connectorCommand(native = false, "source-faker", venv,
      "airbyte/source-faker", "6.2.10") ==
      Seq("docker", "run", "--rm", "-i", "airbyte/source-faker:6.2.10"))
  }
}
