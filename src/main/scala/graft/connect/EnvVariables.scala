package graft.connect

/** `env:` indirection for config values (reference
  * EnvVariables.checkForEnvironmentVariableValue, EnvVariables.java:
  * 39-105; README.md:274-288):
  *   - `env:{VAR}`        → value of VAR; error if unset
  *   - `env:{VAR:default}`→ value of VAR, or the default if unset
  *   - `env:VAR`          → legacy bare form, error if unset
  * System properties are consulted before environment variables, as
  * the reference does via Lib.getenv.
  */
object EnvVariables {
  private val Braced = """env:\{([^:}]+)\}""".r
  private val BracedDefault = """env:\{([^:}]+):([^}]*)\}""".r
  private val Bare = """env:(.+)""".r

  def lookup(name: String): Option[String] =
    sys.props.get(name).orElse(sys.env.get(name))

  /** Resolve a possibly-env-indirected config value. `field` names the
    * config key for error messages.
    */
  def resolve(value: String, field: String): String = value match {
    case null => null
    case Braced(name) =>
      lookup(name).getOrElse(throw new ConfigException(
        s"Environment variable '$name' for '$field' is not set"))
    case BracedDefault(name, default) =>
      lookup(name).getOrElse(default)
    case Bare(name) if !name.startsWith("{") =>
      lookup(name).getOrElse(throw new ConfigException(
        s"Environment variable '$name' for '$field' is not set"))
    case other => other
  }
}

final class ConfigException(msg: String) extends RuntimeException(msg)

/** A state file that failed parse/size/depth constraints — recoverable
  * by discarding and falling back to `.temp`/`.backup` copies, unlike
  * [[ConfigException]] which must fail startup.
  */
final class CorruptStateException(msg: String) extends RuntimeException(msg)
