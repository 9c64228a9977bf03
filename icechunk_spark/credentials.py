"""Reference-parity credential objects and factory helpers.

Mirrors icechunk-python/python/icechunk/credentials.py: the nested
``S3Credentials.Static / Anonymous / FromEnv / Refreshable`` tagged
unions, their GCS / Azure siblings, the ``Credentials.S3/Gcs/Azure``
wrappers used by ``containers_credentials``, and the flat factory
functions (``s3_credentials(...)``, ``gcs_credentials(...)``, …).

These are plain pickleable dataclasses (executor tasks must be able to
carry them) that the storage factories in ``repo/storage.py`` consume:
``s3_storage(..., credentials=s3_credentials(access_key_id=...))``
forwards the keys to both pyarrow's S3FileSystem (bulk plane) and the
boto3 conditional-put client (CAS plane).  Refreshable credentials
call the user's ``get_credentials`` function lazily — on executors
that means each task refreshes locally, exactly the property the
reference's pickled-refreshable design targets
(icechunk-python credentials.py:108+).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from dataclasses import dataclass
from datetime import datetime
from typing import Any


@dataclass
class S3StaticCredentials:
    """Static keys for an S3-compatible store (reference parity:
    icechunk.S3StaticCredentials)."""

    access_key_id: str
    secret_access_key: str
    session_token: str | None = None
    expires_after: datetime | None = None


class S3Credentials:
    """Tagged union of S3 credential modes (reference parity)."""

    @dataclass
    class FromEnv:
        """Use the SDK's environment/instance-profile chain."""

    @dataclass
    class Anonymous:
        """Unsigned requests (public buckets)."""

    @dataclass
    class Static:
        credentials: S3StaticCredentials

    @dataclass
    class Refreshable:
        get_credentials: Callable[[], S3StaticCredentials]
        current: S3StaticCredentials | None = None

        def fetch(self) -> S3StaticCredentials:
            cred = self.current
            now = datetime.now(tz=cred.expires_after.tzinfo) if cred and cred.expires_after else None
            if cred is None or (cred.expires_after and now and now >= cred.expires_after):
                cred = self.get_credentials()
                self.current = cred
            return cred


class GcsStaticCredentials:
    """Tagged union of static GCS credential sources."""

    @dataclass
    class ServiceAccount:
        path: str

    @dataclass
    class ServiceAccountKey:
        key: str

    @dataclass
    class ApplicationCredentials:
        path: str

    @dataclass
    class BearerToken:
        token: str


@dataclass
class GcsBearerCredential:
    """A bearer token with optional expiration (reference parity:
    icechunk.GcsBearerCredential)."""

    bearer: str
    expires_after: datetime | None = None


class GcsCredentials:
    @dataclass
    class Anonymous:
        pass

    @dataclass
    class FromEnv:
        pass

    @dataclass
    class Static:
        credentials: Any  # AnyGcsStaticCredential

    @dataclass
    class Refreshable:
        get_credentials: Callable[[], GcsBearerCredential]
        current: GcsBearerCredential | None = None


@dataclass
class AzureRefreshableCredential:
    """A token + expiration pair returned by a refresh function."""

    token: str
    expires_after: datetime | None = None


class AzureStaticCredentials:
    @dataclass
    class AccessKey:
        key: str

    @dataclass
    class SasToken:
        token: str

    @dataclass
    class BearerToken:
        token: str


class AzureCredentials:
    @dataclass
    class FromEnv:
        pass

    @dataclass
    class Anonymous:
        pass

    @dataclass
    class Static:
        credentials: Any  # AnyAzureStaticCredential

    @dataclass
    class Refreshable:
        get_credentials: Callable[[], AzureRefreshableCredential]
        current: AzureRefreshableCredential | None = None


class Credentials:
    """Per-container credential wrapper used by
    ``containers_credentials`` / ``authorize_virtual_chunk_access``
    (reference parity: icechunk.Credentials)."""

    @dataclass
    class S3:
        credentials: Any  # AnyS3Credential

    @dataclass
    class Gcs:
        credentials: Any  # AnyGcsCredential

    @dataclass
    class Azure:
        credentials: Any  # AnyAzureCredential

    @dataclass
    class LocalFileSystemAccess:
        """Explicit sentinel authorizing a file:// container."""

    @dataclass
    class HttpAccess:
        """Explicit sentinel authorizing an http(s):// container."""


# Sentinels, matching the reference's module-level singletons
LocalFileSystemAccess = Credentials.LocalFileSystemAccess()
HttpAccess = Credentials.HttpAccess()

# typing unions (runtime: tuples usable with isinstance)
AnyS3Credential = (
    S3Credentials.Static | S3Credentials.Anonymous | S3Credentials.FromEnv | S3Credentials.Refreshable
)
AnyGcsStaticCredential = (
    GcsStaticCredentials.ServiceAccount
    | GcsStaticCredentials.ServiceAccountKey
    | GcsStaticCredentials.ApplicationCredentials
    | GcsStaticCredentials.BearerToken
)
AnyGcsCredential = (
    GcsCredentials.Anonymous | GcsCredentials.FromEnv | GcsCredentials.Static | GcsCredentials.Refreshable
)
AnyAzureStaticCredential = (
    AzureStaticCredentials.AccessKey | AzureStaticCredentials.SasToken | AzureStaticCredentials.BearerToken
)
AnyAzureCredential = (
    AzureCredentials.FromEnv | AzureCredentials.Anonymous | AzureCredentials.Static | AzureCredentials.Refreshable
)
AnyCredential = (
    Credentials.S3
    | Credentials.Gcs
    | Credentials.Azure
    | Credentials.LocalFileSystemAccess
    | Credentials.HttpAccess
)


def s3_static_credentials(
    *,
    access_key_id: str,
    secret_access_key: str,
    session_token: str | None = None,
    expires_after: datetime | None = None,
) -> S3Credentials.Static:
    return S3Credentials.Static(
        S3StaticCredentials(access_key_id, secret_access_key, session_token, expires_after)
    )


def s3_anonymous_credentials() -> S3Credentials.Anonymous:
    return S3Credentials.Anonymous()


def s3_from_env_credentials() -> S3Credentials.FromEnv:
    return S3Credentials.FromEnv()


def s3_refreshable_credentials(
    get_credentials: Callable[[], S3StaticCredentials],
    scatter_initial_credentials: bool = False,
) -> S3Credentials.Refreshable:
    """``get_credentials`` must be pickleable — executor tasks refresh
    locally.  ``scatter_initial_credentials`` pre-fetches once so many
    pickled copies (fork sessions) start from the same token."""
    cred = S3Credentials.Refreshable(get_credentials)
    if scatter_initial_credentials:
        cred.fetch()
    return cred


def s3_credentials(
    *,
    access_key_id: str | None = None,
    secret_access_key: str | None = None,
    session_token: str | None = None,
    expires_after: datetime | None = None,
    anonymous: bool | None = None,
    from_env: bool | None = None,
    get_credentials: Callable[[], S3StaticCredentials] | None = None,
    scatter_initial_credentials: bool = False,
):
    """Dispatching factory (reference parity: icechunk.s3_credentials):
    exactly one of static keys / anonymous / from_env / refreshable.
    A bare call (no arguments) means from_env, matching the reference's
    default branch (credentials.py:214: ``from_env is None or from_env``)."""
    if (
        (access_key_id is None)
        and (secret_access_key is None)
        and (session_token is None)
        and (expires_after is None)
        and not anonymous
        and (from_env is None or from_env)
        and (get_credentials is None)
    ):
        return s3_from_env_credentials()
    if (
        (access_key_id is None)
        and (secret_access_key is None)
        and (session_token is None)
        and (expires_after is None)
        and anonymous
        and not from_env
        and (get_credentials is None)
    ):
        return s3_anonymous_credentials()
    if (
        (access_key_id is not None)
        and (secret_access_key is not None)
        and not anonymous
        and not from_env
        and (get_credentials is None)
    ):
        return s3_static_credentials(
            access_key_id=access_key_id,
            secret_access_key=secret_access_key,
            session_token=session_token,
            expires_after=expires_after,
        )
    if (
        (access_key_id is None)
        and (secret_access_key is None)
        and (session_token is None)
        and not anonymous
        and not from_env
        and (get_credentials is not None)
    ):
        return s3_refreshable_credentials(get_credentials, scatter_initial_credentials)
    raise ValueError("invalid credential combination")


def gcs_static_credentials(
    *,
    service_account_file: str | None = None,
    service_account_key: str | None = None,
    application_credentials: str | None = None,
    bearer_token: str | None = None,
):
    if service_account_file is not None:
        return GcsStaticCredentials.ServiceAccount(service_account_file)
    if service_account_key is not None:
        return GcsStaticCredentials.ServiceAccountKey(service_account_key)
    if application_credentials is not None:
        return GcsStaticCredentials.ApplicationCredentials(application_credentials)
    if bearer_token is not None:
        return GcsStaticCredentials.BearerToken(bearer_token)
    raise ValueError("invalid credential combination")


def gcs_refreshable_credentials(
    get_credentials: Callable[[], GcsBearerCredential],
    scatter_initial_credentials: bool = False,
) -> GcsCredentials.Refreshable:
    cred = GcsCredentials.Refreshable(get_credentials)
    if scatter_initial_credentials:
        cred.current = get_credentials()
    return cred


def gcs_anonymous_credentials() -> GcsCredentials.Anonymous:
    return GcsCredentials.Anonymous()


def gcs_from_env_credentials() -> GcsCredentials.FromEnv:
    return GcsCredentials.FromEnv()


def gcs_credentials(
    *,
    service_account_file: str | None = None,
    service_account_key: str | None = None,
    application_credentials: str | None = None,
    bearer_token: str | None = None,
    anonymous: bool | None = None,
    from_env: bool | None = None,
    get_credentials: Callable[[], GcsBearerCredential] | None = None,
    scatter_initial_credentials: bool = False,
):
    statics = (service_account_file, service_account_key, application_credentials, bearer_token)
    if anonymous and not any(statics) and not from_env and get_credentials is None:
        return gcs_anonymous_credentials()
    # bare call -> from_env (reference default branch)
    if (from_env is None or from_env) and not any(statics) and not anonymous and get_credentials is None:
        return gcs_from_env_credentials()
    if any(statics) and not anonymous and not from_env and get_credentials is None:
        return GcsCredentials.Static(
            gcs_static_credentials(
                service_account_file=service_account_file,
                service_account_key=service_account_key,
                application_credentials=application_credentials,
                bearer_token=bearer_token,
            )
        )
    if get_credentials is not None and not any(statics) and not anonymous and not from_env:
        return gcs_refreshable_credentials(get_credentials, scatter_initial_credentials)
    raise ValueError("invalid credential combination")


def azure_static_credentials(
    *,
    access_key: str | None = None,
    sas_token: str | None = None,
    bearer_token: str | None = None,
):
    provided = [x for x in (access_key, sas_token, bearer_token) if x is not None]
    if len(provided) != 1:
        raise ValueError("exactly one of access_key / sas_token / bearer_token")
    if access_key is not None:
        return AzureStaticCredentials.AccessKey(access_key)
    if sas_token is not None:
        return AzureStaticCredentials.SasToken(sas_token)
    return AzureStaticCredentials.BearerToken(bearer_token)  # type: ignore[arg-type]


def azure_refreshable_credentials(
    get_credentials: Callable[[], AzureRefreshableCredential],
    scatter_initial_credentials: bool = False,
) -> AzureCredentials.Refreshable:
    cred = AzureCredentials.Refreshable(get_credentials)
    if scatter_initial_credentials:
        cred.current = get_credentials()
    return cred


def azure_anonymous_credentials() -> AzureCredentials.Anonymous:
    return AzureCredentials.Anonymous()


def azure_from_env_credentials() -> AzureCredentials.FromEnv:
    return AzureCredentials.FromEnv()


def azure_credentials(
    *,
    access_key: str | None = None,
    sas_token: str | None = None,
    bearer_token: str | None = None,
    anonymous: bool | None = None,
    from_env: bool | None = None,
    get_credentials: Callable[[], AzureRefreshableCredential] | None = None,
    scatter_initial_credentials: bool = False,
):
    statics = (access_key, sas_token, bearer_token)
    if anonymous and not any(statics) and not from_env and get_credentials is None:
        return azure_anonymous_credentials()
    # bare call -> from_env (reference default branch)
    if (from_env is None or from_env) and not any(statics) and not anonymous and get_credentials is None:
        return azure_from_env_credentials()
    if any(statics) and not anonymous and not from_env and get_credentials is None:
        return AzureCredentials.Static(
            azure_static_credentials(
                access_key=access_key, sas_token=sas_token, bearer_token=bearer_token
            )
        )
    if get_credentials is not None and not any(statics) and not anonymous and not from_env:
        return azure_refreshable_credentials(get_credentials, scatter_initial_credentials)
    raise ValueError("invalid credential combination")


def _none_credential_replacement(scheme: str) -> tuple[str, str]:
    """Suggested explicit credential expression (and an S3 security
    note) for a container scheme whose credential was passed as
    ``None`` (reference parity: icechunk-python repository.py:27-52)."""
    if scheme in ("s3", "tigris"):
        return "Credentials.S3(S3Credentials.FromEnv())", (
            " Note: `None` currently reads credentials from the environment"
            " (or falls back to anonymous access), which can expose private"
            " credentials."
        )
    if scheme in ("gs", "gcs"):
        return "Credentials.Gcs(GcsCredentials.Anonymous())", ""
    if scheme in ("az", "azure", "abfs"):
        return "Credentials.Azure(AzureCredentials.FromEnv())", ""
    if scheme == "file":
        return "LocalFileSystemAccess", ""
    if scheme in ("http", "https"):
        return "HttpAccess", ""
    return "...", ""


def warn_on_none_virtual_chunk_credentials(
    authorize_virtual_chunk_access: Mapping[str, Any] | None,
) -> None:
    """DeprecationWarning for every ``None`` value in an
    ``authorize_virtual_chunk_access`` map: ``None`` is overloaded and
    silently permissive; the explicit per-backend sentinels replace it
    and ``None`` will be rejected in a future release (reference
    parity: icechunk-python repository.py:55-84, icechunk#2194)."""
    import os
    import sys
    import warnings

    if not authorize_virtual_chunk_access:
        return
    # attribute the warning to the first frame OUTSIDE this package —
    # a fixed stacklevel cannot be right for both direct Repository()
    # construction and the open()/reopen() wrappers, and a warning
    # attributed to icechunk_spark/ is invisible under Python's
    # default __main__-only DeprecationWarning filter
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    stacklevel = 2
    frame = sys._getframe(1)

    def _inside_pkg(path: str) -> bool:
        d = os.path.dirname(os.path.abspath(path))
        # exact dir or a true subdirectory — a bare startswith would
        # also claim sibling dirs like .../icechunk_spark_ext
        return d == pkg_dir or d.startswith(pkg_dir + os.sep)

    while frame is not None and _inside_pkg(frame.f_code.co_filename):
        stacklevel += 1
        frame = frame.f_back
    for url_prefix, cred in authorize_virtual_chunk_access.items():
        if cred is not None:
            continue
        scheme = url_prefix.split("://", 1)[0]
        replacement, security_note = _none_credential_replacement(scheme)
        warnings.warn(
            f"Passing `None` in `authorize_virtual_chunk_access` for container "
            f"`{url_prefix}` is deprecated and will be unsupported in a future "
            f"release; pass an explicit credential or no-auth sentinel instead. "
            f"For example:\n    authorize_virtual_chunk_access="
            f'{{"{url_prefix}": {replacement}}}{security_note} '
            f"See icechunk issue #2194 for details.",
            DeprecationWarning,
            stacklevel=stacklevel,
        )


def containers_credentials(
    m: Mapping[str, Any] | None = None, **kwargs: Any
) -> dict[str, Any]:
    """Build the ``authorize_virtual_chunk_access`` map from per-
    container credentials (reference parity:
    icechunk.containers_credentials).  Values may be ``Credentials.*``
    wrappers, bare ``S3Credentials.*``-style objects (wrapped
    automatically), or ``None`` (container readable without creds)."""
    out: dict[str, Any] = {}
    for name, cred in {**(dict(m) if m else {}), **kwargs}.items():
        if cred is None or isinstance(cred, AnyCredential):
            out[name] = cred
        elif isinstance(cred, AnyS3Credential):
            out[name] = Credentials.S3(cred)
        elif isinstance(cred, AnyGcsCredential):
            out[name] = Credentials.Gcs(cred)
        elif isinstance(cred, AnyAzureCredential):
            out[name] = Credentials.Azure(cred)
        else:
            raise ValueError(f"unrecognized credential for container {name!r}: {cred!r}")
    return out


__all__ = [
    "AnyAzureCredential",
    "AnyAzureStaticCredential",
    "AnyCredential",
    "AnyGcsCredential",
    "AnyGcsStaticCredential",
    "AnyS3Credential",
    "AzureCredentials",
    "AzureRefreshableCredential",
    "AzureStaticCredentials",
    "Credentials",
    "GcsBearerCredential",
    "GcsCredentials",
    "GcsStaticCredentials",
    "HttpAccess",
    "LocalFileSystemAccess",
    "S3Credentials",
    "S3StaticCredentials",
    "azure_anonymous_credentials",
    "azure_credentials",
    "azure_from_env_credentials",
    "azure_refreshable_credentials",
    "azure_static_credentials",
    "containers_credentials",
    "gcs_anonymous_credentials",
    "gcs_credentials",
    "gcs_from_env_credentials",
    "gcs_refreshable_credentials",
    "gcs_static_credentials",
    "s3_anonymous_credentials",
    "s3_credentials",
    "s3_from_env_credentials",
    "s3_refreshable_credentials",
    "s3_static_credentials",
]
