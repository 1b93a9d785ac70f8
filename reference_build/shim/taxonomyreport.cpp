// Shim: krona prelude resource (mmseqs embeds the full Krona viewer;
// outputs here reference the hosted Krona JS so report structure stays
// identical while the embedded blob is not reproduced).
static const char krona_prelude_html_str[] =
    "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\"/>"
    "<base href=\"https://krona.sourceforge.net/\" target=\"_blank\"/>"
    "<link rel=\"shortcut icon\" href=\"img/favicon.ico\"/>"
    "<script id=\"notfound\">window.onload=function(){"
    "document.body.innerHTML=\"Could not get resources from "
    "\\\"https://krona.sourceforge.net\\\".\"}</script>"
    "<script src=\"src/krona-2.0.js\"></script></head>"
    "<body><img id=\"hiddenImage\" src=\"img/hidden.png\" "
    "style=\"display:none\" alt=\"\"/><noscript>Javascript must be enabled"
    "</noscript><div style=\"display:none\"><krona collapse=\"false\" "
    "key=\"true\">";

#include <string>

// XML attribute escaping for Krona node names (mmseqs taxonomyreport)
static std::string escapeAttribute(const std::string &data) {
    std::string out;
    out.reserve(data.size() * 11 / 10);
    for (size_t i = 0; i < data.size(); ++i) {
        switch (data[i]) {
            case '&': out.append("&amp;"); break;
            case '\"': out.append("&quot;"); break;
            case '\'': out.append("&apos;"); break;
            case '<': out.append("&lt;"); break;
            case '>': out.append("&gt;"); break;
            default: out.append(1, data[i]); break;
        }
    }
    return out;
}

static const unsigned char *krona_prelude_html =
    (const unsigned char *)krona_prelude_html_str;
static const unsigned int krona_prelude_html_len =
    sizeof(krona_prelude_html_str) - 1;
