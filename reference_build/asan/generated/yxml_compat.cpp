extern "C" {
#include "/root/reference/lib/yxml/yxml.c"
}
