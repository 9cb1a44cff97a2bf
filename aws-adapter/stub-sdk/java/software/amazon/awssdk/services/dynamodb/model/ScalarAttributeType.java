package software.amazon.awssdk.services.dynamodb.model;

public enum ScalarAttributeType { S, N, B }
