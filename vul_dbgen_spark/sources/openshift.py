"""OpenShift manual records (SURVEY.md S21).

Behavioral spec: ``/root/reference/updater/fetchers/apps/openshift.go``.
Five hand-coded advisories, reproduced as data. Version strings carry
the ``,branch`` qualifier (e.g. ``3.11.43-1,3.11``) the scanner uses for
per-branch matching (openshift.go:18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import register_app
from ..schemas import APP_VULNS
from .app_base import finish_app_vulns


def _t(op, v):
    return {"op_code": op, "version": v}


_RECORDS = [
    dict(
        vul_name="CVE-2018-1002105",
        app_name="openshift.kubernetes",
        module_name="openshift.kubernetes",
        description=(
            "A flaw has been detected in kubernetes which allows privilege escalation and "
            "access to sensitive information in OpenShift products and services.  This issue "
            "has been assigned CVE-2018-1002105 and has a security impact of Critical."
        ),
        link="https://access.redhat.com/security/vulnerabilities/3716411",
        score=9.8,
        severity="Critical",
        affected_ver=[
            _t("lt", "3.2.1.34-2,3.2"),
            _t("orlt", "3.11.43-1,3.11"),
            _t("orlt", "3.10.72-1,3.10"),
            _t("orlt", "3.9.51-1,3.9"),
            _t("orlt", "3.8.44-1,3.8"),
            _t("orlt", "3.7.72-1,3.7"),
            _t("orlt", "3.6.173.0.140-1,3.6"),
            _t("orlt", "3.5.5.31.80-1,3.5"),
            _t("orlt", "3.4.1.44.57-1,3.4"),
            _t("orlt", "3.3.1.46.45-1,3.3"),
        ],
        fixed_ver=[
            _t("gteq", "3.2.1.34-2,3.2"),
            _t("orgteq", "3.11.43-1,3.11"),
            _t("orgteq", "3.10.72-1,3.10"),
            _t("orgteq", "3.9.51-1,3.9"),
            _t("orgteq", "3.8.44-1,3.8"),
            _t("orgteq", "3.7.72-1,3.7"),
            _t("orgteq", "3.6.173.0.140-1,3.6"),
            _t("orgteq", "3.5.5.31.80-1,3.5"),
            _t("orgteq", "3.4.1.44.57-1,3.4"),
            _t("orgteq", "3.3.1.46.45-1,3.3"),
        ],
        cves=["CVE-2018-1002105"],
    ),
    dict(
        vul_name="CVE-2019-1002101",
        app_name="openshift.kubernetes",
        module_name="openshift.kubernetes",
        description=(
            "A flaw was found in Kubernetes via the mishandling of symlinks when copying "
            "files from a running container. An attacker could exploit this by convincing a "
            "user to use `kubectl cp` or `oc cp` with a malicious container, allowing for "
            "arbitrary files to be overwritten on the host machine."
        ),
        link="https://access.redhat.com/security/cve/cve-2019-1002101",
        score=5.3,
        severity="Medium",
        affected_ver=[
            _t("lt", "3.11.99,3.11"),
            _t("orlt", "3.10.99,3.10"),
            _t("orlt", "3.9.99,3.9"),
        ],
        cves=["CVE-2019-1002101"],
    ),
    dict(
        vul_name="CVE-2021-25735",
        app_name="openshift.kubernetes",
        module_name="openshift.kubernetes",
        description=(
            "A security issue was discovered in kube-apiserver that could allow node updates "
            "to bypass a Validating Admission Webhook. You are only affected by this "
            "vulnerability if you run a Validating Admission Webhook for Nodes that denies "
            "admission based at least partially on the old state of the Node object."
        ),
        score_v3=6.5,
        vectors_v3="CVSS:3.1/AV:N/AC:L/PR:H/UI:N/S:U/C:N/I:H/A:H",
        severity="Medium",
        affected_ver=[
            _t("gteq", "1.0"),
            _t("andlteq", "1.18.17"),
            _t("orlteq", "1.19.9,1.19"),
            _t("orlteq", "1.20.5,1.20"),
        ],
        fixed_ver=[_t("gt", "1.19.9,1.19"), _t("orgt", "1.20.5,1.20")],
        cves=["CVE-2021-25735"],
    ),
    dict(
        vul_name="CVE-2021-25741",
        app_name="openshift.kubernetes",
        module_name="openshift.kubernetes",
        description=(
            "A security issue was discovered in Kubernetes where a user may be able to "
            "create a container with subpath volume mounts to access files & directories "
            "outside of the volume, including on the host filesystem."
        ),
        score_v3=8.8,
        vectors_v3="CVSS:3.1/AV:N/AC:L/PR:L/UI:N/S:U/C:H/I:H/A:H",
        severity="High",
        affected_ver=[
            _t("gteq", "1.0"),
            _t("andlteq", "1.19.14"),
            _t("orlteq", "1.20.10,1.20"),
            _t("orlteq", "1.21.4,1.21"),
            _t("orlteq", "1.22.1,1.22"),
        ],
        fixed_ver=[
            _t("gt", "1.19.14,1.19"),
            _t("orgt", "1.20.10,1.20"),
            _t("orgt", "1.21.4,1.21"),
            _t("orgt", "1.22.1,1.22"),
        ],
        cves=["CVE-2021-25741"],
    ),
    dict(
        vul_name="CVE-2020-8554",
        app_name="openshift.kubernetes",
        module_name="kubernetes",
        description=(
            "Kubernetes API server in all versions allow an attacker who is able to create a "
            "ClusterIP service and set the spec.externalIPs field, to intercept traffic to "
            "that IP address. Additionally, an attacker who is able to patch the status "
            "(which is considered a privileged operation and should not typically be granted "
            "to users) of a LoadBalancer service can set the status.loadBalancer.ingress.ip "
            "to similar effect."
        ),
        score_v3=5.0,
        score=6.0,
        vectors_v3="CVSS:3.1/AV:N/AC:H/PR:L/UI:N/S:U/C:L/I:L/A:L",
        vectors="AV:N/AC:M/Au:S/C:P/I:P/A:P",
        severity="Medium",
        affected_ver=[_t("gteq", "1.0"), _t("andlteq", "1.22.0")],
        fixed_ver=[_t("gt", "1.22.0")],
        cves=["CVE-2020-8554"],
    ),
]


@register_app("openshift")
def load(spark: SparkSession, source_root: str) -> DataFrame:
    rows = [{f.name: r.get(f.name) for f in APP_VULNS.fields} for r in _RECORDS]
    return finish_app_vulns(spark.createDataFrame(rows, APP_VULNS))
