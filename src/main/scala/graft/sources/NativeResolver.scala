package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.nio.file.Path

/** Native-connector resolution (SURVEY §2.1 #6, reference
  * `tap_airbyte/tap.py:350-439`): decide whether a connector image can run
  * as a native PyPI package instead of a container, and construct the
  * provisioning commands.
  *
  * This implements the DECISION and COMMAND-CONSTRUCTION logic — registry
  * parsing (`oss_registry.json` shape), the native/docker choice with the
  * reference's `force_native`/`skip_native_check` overrides, the
  * `airbyte-<source>~=<tag>` requirement string, and the venv+pip argv —
  * as pure, unit-testable functions. EXECUTING the provisioning (network
  * registry fetch, pip install) is environment bootstrap, driver-side
  * policy outside the engine (and impossible in a zero-egress container);
  * callers run the returned argv through [[SubprocessSource]] machinery or
  * their own process runner.
  */
object NativeResolver {

  private val mapper = new ObjectMapper()

  /** Registry lookup (reference `_is_native_connector`, tap.py:401-424):
    * a connector is native-eligible iff some registry source entry has
    * `dockerRepository == image` with `remoteRegistries.pypi.enabled`.
    * `registry` is a parsed `oss_registry.json` document (the reference
    * fetches it from connectors.airbyte.com; here it arrives as data).
    */
  def isNativeInRegistry(registry: JsonNode, image: String): Boolean = {
    val sources = Option(registry.get("sources")).toSeq
      .flatMap(s => scala.jdk.CollectionConverters.IteratorHasAsScala(s.elements()).asScala)
    sources.find(s => s.path("dockerRepository").asText == image)
      .exists(_.path("remoteRegistries").path("pypi").path("enabled").asBoolean(false))
  }

  def isNativeInRegistry(registryJson: String, image: String): Boolean =
    isNativeInRegistry(mapper.readTree(registryJson), image)

  /** Full decision with the reference's config overrides (tap.py:402-408,
    * 428-431): `skip_native_check` forces docker; `force_native` forces
    * native without consulting the registry; a missing registry (the
    * reference's swallowed fetch failure) resolves to docker.
    */
  def decide(
      image: String,
      registry: Option[JsonNode],
      forceNative: Boolean = false,
      skipNativeCheck: Boolean = false): Boolean =
    if (skipNativeCheck) false
    else if (forceNative) true
    else registry.exists(isNativeInRegistry(_, image))

  /** `airbyte-<source>~=<tag>` (reference `_get_requirement_string`,
    * tap.py:394-399): no version pin when the tag is "latest".
    */
  def requirementString(sourceName: String, tag: String): String = {
    val name = s"airbyte-$sourceName"
    if (tag == "latest") name else s"$name~=$tag"
  }

  /** Provisioning argv (reference `setup_native_connector_venv`,
    * tap.py:350-383): create the venv (optionally with a pinned python),
    * then pip-install the requirement — returned as commands, not run.
    */
  def venvCommands(
      venvPath: Path,
      requirement: String,
      python: Option[String] = None): Seq[Seq[String]] = {
    val venv = python match {
      case Some(p) => Seq("virtualenv", "-p", p, venvPath.toString)
      case None    => Seq("virtualenv", venvPath.toString)
    }
    Seq(venv, Seq(s"$venvPath/bin/pip", "install", requirement))
  }

  /** The resolved connector entry point: the venv binary when native,
    * else the container argv from [[CommandBuilder]].
    */
  def connectorCommand(
      native: Boolean,
      sourceName: String,
      venvPath: Path,
      image: String,
      tag: String,
      mounts: Seq[CommandBuilder.Mount] = Seq.empty): Seq[String] =
    if (native) Seq(s"$venvPath/bin/$sourceName")
    else CommandBuilder.container(image, tag, mounts = mounts)
}
